"""PyTorch state-dict <-> flax param-tree conversion and checkpoint surgery.

This is the TPU-native counterpart of reference weight_init.py: it lets published
PyTorch checkpoints (ViT-21k ImageNet, MAE, Kinetics-trained reference ckpts)
seed our flax models, and powers the golden parity tests (copy reference weights
into the JAX model, compare logits).

Key mapping (reference module path -> flax param path):
- ``transformer_layers.layers.{i}``          -> ``transformer_layers/layers_{i}``
- ``transformer_layers.{0,1}.layers.{i}``    -> ``{spatial,temporal}_transformer/layers_{i}``
  (ViViT fact_encoder, video_transformer.py:374-398)
- ``attentions.{j}`` / ``ffns.{j}``          -> ``attentions_{j}`` / ``ffns_{j}``
- FFN inner ``layers.0.0`` / ``layers.1``    -> ``layers_0`` / ``layers_1``
  (reference FFNWithPreNorm builds Sequential(Linear,GELU,Dropout) + Linear,
  transformer.py:496-507)
- Linear ``weight`` (out,in)                 -> ``kernel`` (in,out)  [transpose]
- Conv2d ``weight`` (o,i,kh,kw)              -> ``kernel`` (kh,kw,i,o)
- Conv3d ``weight`` (o,i,kt,kh,kw)           -> ``kernel`` (kt,kh,kw,i,o)
- LayerNorm ``weight``                       -> ``scale``

Checkpoint surgery mirrors reference weight_init.py:
- ``replace_state_dict`` (:17-28): strip ``model.``/cls_head prefixes,
  ``in_proj_ -> qkv.``, ``out_proj -> proj``.
- ``init_from_vit_pretrain_`` (:106-184): Conv2d->Conv3d tubelet inflation
  (temporal_avg / center_frame), fact_encoder container remap, norm-key remap,
  spatial->temporal attention copy (repeat / set_zero), fact_encoder copies the
  first ``num_time_transformer_layers`` spatial layers into the temporal stack.
- ``init_from_mae_pretrain_`` (:187-302): MAE naming variant incl. the
  q_bias/zeros/v_bias concatenation into qkv.bias.
"""

import re
from typing import Any, Dict, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# torch-style state-dict surgery (all on numpy arrays; torch only for .pth IO)
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.pt checkpoint into {key: np.ndarray}."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    if isinstance(state, dict) and "model" in state and all(
        not hasattr(v, "numpy") for k, v in state.items() if k != "model"
    ):
        state = state["model"]
    return {k: v.detach().cpu().numpy() for k, v in state.items() if hasattr(v, "detach")}


def replace_state_dict(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Reference weight_init.py:17-28: strip lightning prefixes, qkv/proj remap."""
    out = {}
    for old_key, v in state_dict.items():
        if old_key.startswith("model"):
            new_key = old_key[6:]
            if "in_proj" in new_key:
                new_key = new_key.replace("in_proj_", "qkv.")
            elif "out_proj" in new_key:
                new_key = new_key.replace("out_proj", "proj")
        else:  # cls_head.cls_head.* -> cls_head.*
            new_key = old_key[9:]
        out[new_key] = v
    return out


def surgery_from_vit_pretrain(
    state_dict: Dict[str, np.ndarray],
    conv_type: str,
    attention_type: str,
    copy_strategy: str = "repeat",
    extend_strategy: str = "temporal_avg",
    tube_size: int = 2,
    num_time_transformer_layers: int = 4,
) -> Dict[str, np.ndarray]:
    """Reference init_from_vit_pretrain_ (weight_init.py:106-184), minus the IO."""
    state_dict = dict(state_dict)

    for old_key in list(state_dict.keys()):
        if conv_type == "Conv3d" and "patch_embed.projection.weight" in old_key:
            weight = state_dict[old_key]  # (o, i, kh, kw)
            new_weight = np.repeat(weight[:, :, None], tube_size, axis=2)
            if extend_strategy == "temporal_avg":
                new_weight = new_weight / tube_size
            elif extend_strategy == "center_frame":
                # Intended semantics: zero everywhere except the center frame
                # slice. NB the reference's implementation
                # (weight_init.py:134-136) calls .zero_() on an einops-expanded
                # stride-0 VIEW, which also wipes the source tensor and leaves
                # the whole kernel zero — a bug we deliberately do not
                # reproduce (center_frame is opt-in; published results use
                # temporal_avg).
                new_weight = np.zeros_like(new_weight)
                new_weight[:, :, tube_size // 2] = weight
            state_dict[old_key] = new_weight
            continue

        if attention_type == "fact_encoder":
            new_key = old_key.replace(
                "transformer_layers.layers", "transformer_layers.0.layers"
            )
        else:
            new_key = old_key

        if "in_proj" in new_key:
            new_key = new_key.replace("in_proj_", "qkv.")
        elif "out_proj" in new_key:
            new_key = new_key.replace("out_proj", "proj")

        if "norms" in new_key:
            new_key = new_key.replace("norms.0", "attentions.0.norm")
            new_key = new_key.replace("norms.1", "ffns.0.norm")

        state_dict[new_key] = state_dict.pop(old_key)

    for old_key in list(state_dict.keys()):
        if attention_type == "divided_space_time":
            if "attentions.0" in old_key:
                new_key = old_key.replace("attentions.0", "attentions.1")
                if copy_strategy == "repeat":
                    state_dict[new_key] = state_dict[old_key].copy()
                elif copy_strategy == "set_zero":
                    state_dict[new_key] = np.zeros_like(state_dict[old_key])
        elif attention_type == "fact_encoder":
            matches = re.findall(r"(?<=layers\.)\d+", old_key)
            if len(matches) > 1 and int(matches[1]) < num_time_transformer_layers:
                new_key = old_key.replace(
                    "transformer_layers.0.layers", "transformer_layers.1.layers"
                )
                if copy_strategy == "repeat":
                    state_dict[new_key] = state_dict[old_key].copy()
                elif copy_strategy == "set_zero":
                    state_dict[new_key] = np.zeros_like(state_dict[old_key])
    return state_dict


def surgery_from_mae_pretrain(
    state_dict: Dict[str, np.ndarray],
    conv_type: str,
    attention_type: str,
    copy_strategy: str = "repeat",
    extend_strategy: str = "temporal_avg",
    tube_size: int = 2,
    num_time_transformer_layers: int = 4,
) -> Dict[str, np.ndarray]:
    """Reference init_from_mae_pretrain_ (weight_init.py:187-302), minus the IO."""
    state_dict = dict(state_dict)

    for old_key in list(state_dict.keys()):
        if old_key not in state_dict:
            continue
        if "decoder" in old_key:
            state_dict.pop(old_key)
            continue

        if "encoder.patch_embed.proj" in old_key:
            new_key = old_key.replace("encoder.patch_embed.proj", "patch_embed.projection")
            if conv_type == "Conv3d" and "weight" in old_key:
                weight = state_dict[old_key]
                new_weight = np.repeat(weight[:, :, None], tube_size, axis=2)
                if extend_strategy == "temporal_avg":
                    new_weight = new_weight / tube_size
                elif extend_strategy == "center_frame":
                    new_weight = np.zeros_like(new_weight)
                    new_weight[:, :, tube_size // 2] = weight
                state_dict.pop(old_key)
                state_dict[new_key] = new_weight
            else:
                state_dict[new_key] = state_dict.pop(old_key)
            continue

        if attention_type == "fact_encoder":
            new_key = old_key.replace("encoder.blocks", "transformer_layers.0.layers")
        else:
            new_key = old_key.replace("encoder.blocks", "transformer_layers.layers")

        if "norm" in new_key:
            new_key = new_key.replace("norm1", "attentions.0.norm")
            new_key = new_key.replace("norm2", "ffns.0.norm")
        elif "attn" in new_key:
            if "q_bias" in new_key:
                block_id = int(re.findall(r"(?<=blocks\.)\d+", old_key)[0])
                q_bias = state_dict[f"encoder.blocks.{block_id}.attn.q_bias"]
                v_bias = state_dict[f"encoder.blocks.{block_id}.attn.v_bias"]
                qkv_bias = np.concatenate([q_bias, np.zeros_like(q_bias), v_bias])
                new_key = new_key.replace("attn.q_bias", "attentions.0.attn.qkv.bias")
                state_dict.pop(f"encoder.blocks.{block_id}.attn.q_bias")
                state_dict.pop(f"encoder.blocks.{block_id}.attn.v_bias")
                state_dict[new_key] = qkv_bias
                continue
            elif "v_bias" in new_key:
                continue
            new_key = new_key.replace("attn.qkv", "attentions.0.attn.qkv")
            new_key = new_key.replace("attn.proj", "attentions.0.attn.proj")
        elif "mlp" in new_key:
            new_key = new_key.replace("mlp.fc1", "ffns.0.layers.0.0")
            new_key = new_key.replace("mlp.fc2", "ffns.0.layers.1")

        if "encoder.norm" in old_key:
            new_key = old_key.replace("encoder.norm", "norm")

        state_dict[new_key] = state_dict.pop(old_key)

    for old_key in list(state_dict.keys()):
        if attention_type == "divided_space_time":
            if "attentions.0" in old_key:
                new_key = old_key.replace("attentions.0", "attentions.1")
                if copy_strategy == "repeat":
                    state_dict[new_key] = state_dict[old_key].copy()
                elif copy_strategy == "set_zero":
                    state_dict[new_key] = np.zeros_like(state_dict[old_key])
        elif attention_type == "fact_encoder":
            matches = re.findall(r"(?<=layers\.)\d+", old_key)
            if len(matches) > 1 and int(matches[1]) < num_time_transformer_layers:
                new_key = old_key.replace(
                    "transformer_layers.0.layers", "transformer_layers.1.layers"
                )
                if copy_strategy == "repeat":
                    state_dict[new_key] = state_dict[old_key].copy()
                elif copy_strategy == "set_zero":
                    state_dict[new_key] = np.zeros_like(state_dict[old_key])
    return state_dict


def surgery_maskfeat_keys(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Map pytorchvideo-style MaskFeat/MViT names to our flax module names.

    reference names (video_transformer.py:834-864 + pytorchvideo internals):
    - ``patch_embed.patch_model``  -> ``patch_embed`` (we use a bare Conv)
    - ``mlp.fc1`` / ``mlp.fc2``    -> ``mlp_fc1`` / ``mlp_fc2``
    - ``attn.pool_{q,k,v}``        -> ``attn.pool_{q,k,v}.conv``
    """
    out = {}
    for k, v in state_dict.items():
        nk = k.replace("patch_embed.patch_model", "patch_embed")
        nk = nk.replace("mlp.fc1", "mlp_fc1").replace("mlp.fc2", "mlp_fc2")
        for pool in ("pool_q", "pool_k", "pool_v"):
            nk = nk.replace(f"attn.{pool}.weight", f"attn.{pool}.conv.weight")
        out[nk] = v
    return out


def init_maskfeat_from_kinetics_pretrain(params, pretrain_path, verbose=True):
    """MaskFeat/MViT checkpoint import (reference init_from_kinetics_pretrain_
    applied to MaskFeat, video_transformer.py:869-870)."""
    sd = load_torch_state_dict(pretrain_path)
    sd = replace_state_dict(sd)
    sd = surgery_maskfeat_keys(sd)
    imported = torch_to_flax_params(sd)
    merged, missing, unexpected = merge_params(params, imported)
    if verbose:
        print(f"missing_keys:{missing}\n unexpected_keys:{unexpected}")
    return merged


def init_from_orbax_pretrain(params, pretrain_path, verbose=True):
    """Params-only init from one of THIS framework's own orbax checkpoints
    (the trainer's ``save_checkpoint`` layout: payload["params"]["model"]).

    This is the native half of the reference's pretrain->finetune handoff
    (model_trainer.py:72-77): a MaskFeat mim run's last_checkpoint seeds an
    ``-arch mvit -objective supervised`` finetune. The optimizer state and
    step counters are deliberately ignored, and the merge is non-strict
    (``load_state_dict(strict=False)`` semantics) so a mim checkpoint with no
    cls_head — or a supervised one with an extra cls_head — both load.
    """
    import os

    import orbax.checkpoint as ocp

    payload = ocp.PyTreeCheckpointer().restore(os.path.abspath(pretrain_path))
    imported = payload.get("params", payload)
    if isinstance(imported, dict) and "model" in imported:
        imported = imported["model"]
    merged, missing, unexpected = merge_params(params, imported)
    if verbose:
        print(f"missing_keys:{missing}\n unexpected_keys:{unexpected}")
    return merged


# ---------------------------------------------------------------------------
# torch key path -> flax param path
# ---------------------------------------------------------------------------

def _map_key(key: str, fact_encoder: bool) -> Tuple[str, ...]:
    """Map one reference param path to a flax param-tree path (without the leaf)."""
    parts = key.split(".")
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "transformer_layers" and fact_encoder and i + 1 < len(parts) and parts[i + 1] in ("0", "1"):
            out.append("spatial_transformer" if parts[i + 1] == "0" else "temporal_transformer")
            i += 2
            # skip following "layers" + idx into layers_{idx}
            if i + 1 < len(parts) and parts[i] == "layers":
                out.append(f"layers_{parts[i + 1]}")
                i += 2
            continue
        if p in ("layers", "attentions", "ffns", "blocks") and i + 1 < len(parts) and parts[i + 1].isdigit():
            # FFN inner Sequential: layers.0.0 -> layers_0 ; layers.1 -> layers_1
            # (the trailing ".0" is the Linear inside Sequential(Linear,GELU,Dropout);
            # it is always the final segment since the weight/bias leaf is stripped)
            idx = parts[i + 1]
            if p == "layers" and i + 2 == len(parts) - 1 and parts[i + 2] == "0":
                out.append(f"layers_{idx}")
                i += 3
                continue
            out.append(f"{p}_{idx}")
            i += 2
            continue
        out.append(p)
        i += 1
    return tuple(out)


def _convert_leaf(path: Tuple[str, ...], leaf: str, value: np.ndarray):
    """Map a torch parameter tensor to the flax (name, array)."""
    if leaf == "weight":
        if value.ndim == 1:  # LayerNorm
            return "scale", value
        if value.ndim == 2:  # Linear
            return "kernel", value.T
        if value.ndim == 4:  # Conv2d (o,i,kh,kw) -> (kh,kw,i,o)
            return "kernel", value.transpose(2, 3, 1, 0)
        if value.ndim == 5:  # Conv3d (o,i,kt,kh,kw) -> (kt,kh,kw,i,o)
            return "kernel", value.transpose(2, 3, 4, 1, 0)
        raise ValueError(f"Unhandled weight ndim {value.ndim} at {path}")
    if leaf == "bias":
        return "bias", value
    # plain parameters: cls_token, pos_embed, time_embed, mask_token
    return leaf, value


def torch_to_flax_params(
    state_dict: Dict[str, np.ndarray],
    attention_type: str = "divided_space_time",
) -> Dict[str, Any]:
    """Convert a (post-surgery) reference state dict into a nested flax param dict."""
    fact = attention_type == "fact_encoder"
    tree: Dict[str, Any] = {}
    for key, value in state_dict.items():
        parts = key.split(".")
        if parts[-1] in ("weight", "bias"):
            path = _map_key(".".join(parts[:-1]), fact)
            leaf, arr = _convert_leaf(path, parts[-1], value)
        else:
            path = _map_key(".".join(parts[:-1]), fact) if len(parts) > 1 else ()
            leaf, arr = _convert_leaf(path, parts[-1], value)
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = np.asarray(arr)
    return tree


def merge_params(flax_params: Dict[str, Any], imported: Dict[str, Any], _path=""):
    """Non-strict merge (reference ``load_state_dict(strict=False)`` semantics).

    Returns (merged, missing_keys, unexpected_keys). ``merged`` has the same
    treedef as ``flax_params``; leaves present in ``imported`` with matching
    shapes are replaced.
    """
    import jax.numpy as jnp

    missing, unexpected = [], []

    def rec(dst, src, path):
        out = {}
        src = src or {}
        for k, v in dst.items():
            p = f"{path}/{k}" if path else k
            if isinstance(v, dict):
                sub = src.get(k)
                if sub is not None and not isinstance(sub, dict):
                    unexpected.append(p)
                    sub = None
                out[k] = rec(v, sub, p)
            else:
                if k in src and not isinstance(src[k], dict):
                    arr = np.asarray(src[k])
                    if tuple(arr.shape) == tuple(v.shape):
                        out[k] = jnp.asarray(arr, dtype=v.dtype)
                    else:
                        unexpected.append(f"{p} (shape {arr.shape} vs {tuple(v.shape)})")
                        out[k] = v
                else:
                    missing.append(p)
                    out[k] = v
        for k in src:
            p = f"{path}/{k}" if path else k
            if k not in dst:
                unexpected.append(p)
        return out

    merged = rec(flax_params, imported, _path)
    return merged, missing, unexpected


# ---------------------------------------------------------------------------
# high-level loaders (reference init_from_* equivalents)
# ---------------------------------------------------------------------------

def init_from_vit_pretrain(
    params, pretrain_path, conv_type, attention_type, copy_strategy,
    extend_strategy="temporal_avg", tube_size=2, num_time_transformer_layers=4,
    verbose=True,
):
    sd = load_torch_state_dict(pretrain_path)
    sd = surgery_from_vit_pretrain(
        sd, conv_type, attention_type, copy_strategy, extend_strategy,
        tube_size, num_time_transformer_layers,
    )
    imported = torch_to_flax_params(sd, attention_type)
    merged, missing, unexpected = merge_params(params, imported)
    if verbose:
        print(f"missing_keys:{missing}\n unexpected_keys:{unexpected}")
    return merged


def init_from_mae_pretrain(
    params, pretrain_path, conv_type, attention_type, copy_strategy,
    extend_strategy="temporal_avg", tube_size=2, num_time_transformer_layers=4,
    verbose=True,
):
    sd = load_torch_state_dict(pretrain_path)
    sd = surgery_from_mae_pretrain(
        sd, conv_type, attention_type, copy_strategy, extend_strategy,
        tube_size, num_time_transformer_layers,
    )
    imported = torch_to_flax_params(sd, attention_type)
    merged, missing, unexpected = merge_params(params, imported)
    if verbose:
        print(f"missing_keys:{missing}\n unexpected_keys:{unexpected}")
    return merged


def init_from_kinetics_pretrain(params, pretrain_path, attention_type="divided_space_time", verbose=True):
    """Reference init_from_kinetics_pretrain_ (weight_init.py:305-315)."""
    sd = load_torch_state_dict(pretrain_path)
    sd = replace_state_dict(sd)
    imported = torch_to_flax_params(sd, attention_type)
    merged, missing, unexpected = merge_params(params, imported)
    if verbose:
        print(f"missing_keys:{missing}\n unexpected_keys:{unexpected}")
    return merged


# ---------------------------------------------------------------------------
# reverse direction: flax param tree -> torch state dict (checkpoint export)
# ---------------------------------------------------------------------------

def _unconvert_leaf(leaf: str, value: np.ndarray) -> Tuple[str, np.ndarray]:
    """Inverse of _convert_leaf: flax (name, array) -> torch (name, tensor)."""
    if leaf == "kernel":
        if value.ndim == 2:  # Linear (in,out) -> (out,in)
            return "weight", value.T
        if value.ndim == 4:  # Conv2d (kh,kw,i,o) -> (o,i,kh,kw)
            return "weight", value.transpose(3, 2, 0, 1)
        if value.ndim == 5:  # Conv3d (kt,kh,kw,i,o) -> (o,i,kt,kh,kw)
            return "weight", value.transpose(4, 3, 0, 1, 2)
        raise ValueError(f"Unhandled kernel ndim {value.ndim}")
    if leaf == "scale":  # LayerNorm
        return "weight", value
    return leaf, value


def flax_to_torch_state_dict(
    params: Dict[str, Any], attention_type: str = "divided_space_time",
) -> Dict[str, np.ndarray]:
    """Inverse of torch_to_flax_params: export a flax model param tree as a
    reference-named torch state dict (numpy arrays — ``save_torch_checkpoint``
    writes a .pth the reference's ``load_state_dict`` accepts directly).

    This is the missing half of the reference's checkpoint ecosystem
    (weight_init.py only loads): it lets checkpoints trained here be
    cross-validated in the original PyTorch implementation.
    """
    out: Dict[str, np.ndarray] = {}

    def container_name(name: str) -> str:
        if attention_type == "fact_encoder":
            if name == "spatial_transformer":
                return "transformer_layers.0"
            if name == "temporal_transformer":
                return "transformer_layers.1"
        return name

    def rec(node: Dict[str, Any], prefix: str, in_ffn: bool, n_ffn_layers: int):
        for name, child in node.items():
            if isinstance(child, dict):
                tname = container_name(name)
                m = re.fullmatch(r"(layers|attentions|ffns|blocks)_(\d+)", tname)
                if m:
                    kind, idx = m.group(1), int(m.group(2))
                    tname = f"{kind}.{idx}"
                    if in_ffn and kind == "layers":
                        # reference FFN: Sequential(Linear,GELU,Drop) for all
                        # but the last layer, bare Linear last
                        # (transformer.py:496-507)
                        if idx < n_ffn_layers - 1:
                            tname = f"layers.{idx}.0"
                    child_is_ffn = kind == "ffns"
                else:
                    child_is_ffn = False
                n_layers = sum(
                    1 for k in child if re.fullmatch(r"layers_\d+", k))
                rec(child, f"{prefix}{tname}.", child_is_ffn, n_layers)
            else:
                tname, arr = _unconvert_leaf(name, np.asarray(child))
                out[f"{prefix}{tname}"] = arr.astype(np.float32)

    rec(params, "", False, 0)
    return out


def maskfeat_flax_to_torch_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Export a flax MaskFeat/MViT param tree with the reference's
    pytorchvideo naming (inverse of ``surgery_maskfeat_keys``): the generic
    flax->torch conversion, then ``patch_embed -> patch_embed.patch_model``,
    ``mlp_fc{1,2} -> mlp.fc{1,2}``, ``attn.pool_*.conv.weight ->
    attn.pool_*.weight`` (reference video_transformer.py:834-864 +
    pytorchvideo MultiScaleBlock internals)."""
    sd = flax_to_torch_state_dict(params)
    out = {}
    for k, v in sd.items():
        nk = k.replace("patch_embed.", "patch_embed.patch_model.")
        nk = nk.replace("mlp_fc1", "mlp.fc1").replace("mlp_fc2", "mlp.fc2")
        for pool in ("pool_q", "pool_k", "pool_v"):
            nk = nk.replace(f"attn.{pool}.conv.weight", f"attn.{pool}.weight")
        out[nk] = v
    return out


def save_torch_checkpoint(params: Dict[str, Any], path: str,
                          attention_type: str = "divided_space_time",
                          cls_head: Dict[str, Any] = None,
                          arch: str = "timesformer") -> None:
    """Write a reference-loadable .pth: model params (and optionally the cls
    head) under the lightning-style ``model.`` / ``cls_head.`` prefixes that
    reference replace_state_dict strips (weight_init.py:17-28).
    ``arch="mvit"`` exports MaskFeat/MViT trees with pytorchvideo naming."""
    import torch

    if arch == "mvit":
        flat = maskfeat_flax_to_torch_state_dict(params)
    else:
        flat = flax_to_torch_state_dict(params, attention_type)
    sd = {f"model.{k}": torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flat.items()}
    if cls_head is not None:
        for k, v in flax_to_torch_state_dict(cls_head).items():
            sd[f"cls_head.{k}"] = torch.from_numpy(np.ascontiguousarray(v))
    torch.save({"state_dict": sd}, path)
