"""Tensor-parallel parameter shardings over the mesh 'model' axis.

The reference has no model parallelism (SURVEY §2.2); this is the TPU-native
extension that makes the framework scale past data parallelism. Megatron-style
column/row sharding for every transformer block:

- qkv / fc1 kernels: column-parallel  -> P(None, 'model'), bias P('model')
- proj / fc2 kernels: row-parallel    -> P('model', None), bias replicated
  (XLA inserts the all-reduce over 'model' after the row-parallel matmul)
- everything else (norms, embeddings, convs, heads): replicated

We only annotate the PARAMETERS; jit's SPMD propagation pushes the shardings
through the attention-head reshapes (head count must divide the model-axis
size: 12 heads -> model in {1, 2, 3, 4, 6, 12}).
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


COLUMN_KERNELS = ("qkv", "layers_0", "mlp_fc1")
ROW_KERNELS = ("proj", "layers_1", "mlp_fc2")

# Runtime activation state for the fused-kernel path (mirrors parallel/sp.py:
# flax modules are pure, so the mesh lives here as an explicitly-set module
# global). When active, the fused Pallas MHSA/FFN kernels run PER model-shard
# under jax.shard_map (sp.fused_sharded_call) instead of forcing their
# sharded weight operands gathered (pallas_call has no SPMD partitioning
# rule). The trainer enables it when ``-tp > 1``.
_STATE = {"mesh": None, "axis": "model", "data_axis": "data",
          "seq_axis": "seq"}


def enable_tensor_parallel(mesh: Mesh, axis: str = "model",
                           data_axis: str = "data",
                           seq_axis: str = "seq") -> None:
    assert axis in mesh.axis_names, (axis, mesh.axis_names)
    _STATE.update(mesh=mesh, axis=axis, data_axis=data_axis,
                  seq_axis=seq_axis)


def disable_tensor_parallel() -> None:
    _STATE["mesh"] = None


def active() -> bool:
    m = _STATE["mesh"]
    return m is not None and dict(m.shape).get(_STATE["axis"], 1) > 1


def tp_size() -> int:
    return dict(_STATE["mesh"].shape)[_STATE["axis"]] if active() else 1


def qkv_head_block_perm(embed_dims: int, num_heads: int, tp: int) -> np.ndarray:
    """Column permutation turning the fused-QKV kernel's ``[q|k|v]`` layout
    into ``[q_g0|k_g0|v_g0 | q_g1|k_g1|v_g1 | ...]`` over ``tp`` head groups,
    so a contiguous 'model' shard is itself a valid [q|k|v] block for its
    local heads (what the per-shard fused MHSA kernel consumes)."""
    d = embed_dims
    ghd = (num_heads // tp) * (d // num_heads)  # columns per head group
    blocks = []
    for g in range(tp):
        for part in range(3):  # q, k, v
            base = part * d + g * ghd
            blocks.append(np.arange(base, base + ghd))
    return np.concatenate(blocks)


def tp_spec(path_parts, leaf) -> P:
    """PartitionSpec for one param leaf given its tree path."""
    if len(path_parts) >= 2:
        module, name = path_parts[-2], path_parts[-1]
        # attention out-projection is named 'proj' inside 'attn'; the MViT
        # residual projection ('proj' directly under a block) stays replicated
        in_attn_or_ffn = any(
            p.startswith(("attentions", "ffns", "attn", "blocks", "mlp"))
            for p in path_parts[:-1]
        )
        if module in COLUMN_KERNELS and in_attn_or_ffn:
            if name == "kernel":
                return P(None, "model")
            if name == "bias":
                return P("model")
        if module in ROW_KERNELS and in_attn_or_ffn and module != "proj":
            if name == "kernel":
                return P("model", None)
        if module == "proj" and in_attn_or_ffn and "attn" in path_parts:
            if name == "kernel":
                return P("model", None)
    return P()


def shard_params_tp(mesh: Mesh, params):
    """device_put a param tree with tensor-parallel shardings.

    A leaf whose sharded dim does not divide the model-axis size is placed
    replicated instead — correct numerics, but the tensor parallelism the
    user asked for is OFF for that kernel, so the fallback is loud: every
    such leaf is warned about (the CLI additionally rejects non-divisible
    ``-tp`` up front, model_pretrain.validate_parallel_flags)."""
    import warnings

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    fallbacks = []
    for path, leaf in flat:
        parts = tuple(str(getattr(k, "key", k)) for k in path)
        spec = tp_spec(parts, leaf)
        # sanity: only apply if divisible
        ok = True
        for dim, axis in enumerate(spec):
            if axis == "model" and leaf.shape[dim] % mesh.shape["model"] != 0:
                ok = False
        if not ok:
            fallbacks.append(("/".join(parts), leaf.shape))
        sharding = NamedSharding(mesh, spec if ok else P())
        out.append(jax.device_put(leaf, sharding))
    if fallbacks:
        shown = ", ".join(f"{n}{s}" for n, s in fallbacks[:4])
        warnings.warn(
            f"shard_params_tp: {len(fallbacks)} param leaf(s) do not divide "
            f"the model axis (size {mesh.shape['model']}) and were placed "
            f"REPLICATED — tensor parallelism is off for them: {shown}"
            + (", ..." if len(fallbacks) > 4 else ""),
            stacklevel=2)
    return jax.tree_util.tree_unflatten(treedef, out)
