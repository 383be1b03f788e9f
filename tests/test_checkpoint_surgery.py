"""Golden tests for checkpoint import surgery vs reference weight_init.py.

Builds a fake pretrained ViT checkpoint, runs the REFERENCE surgery+load on the
torch model and OUR surgery+merge on the flax model, then checks the two
models produce identical outputs. Covers: ViT-21k import for TimeSformer
(divided, incl. spatial->temporal copy strategies), ViViT Conv3d inflation
(temporal_avg / center_frame), fact_encoder container remap, and the Kinetics
full-checkpoint reload path.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import video_transformer as ref_vt
import weight_init as ref_wi

from videotransformer_tpu.models import TimeSformer, ViViT
from videotransformer_tpu.models.convert import (
    init_from_kinetics_pretrain, load_torch_state_dict, merge_params,
    replace_state_dict, surgery_from_vit_pretrain, torch_to_flax_params)
from parity_utils import torch_state_to_flax, assert_close

SMALL = dict(img_size=32, patch_size=16, embed_dims=32, num_heads=4,
             num_transformer_layers=2)


def _assert_imported_leaves_equal(imported, merged, ref_tree, msg, path=()):
    """For every leaf path present in `imported`, the merged tree and the
    reference torch model (post its own surgery+load) must agree."""
    for k, v in imported.items():
        p = path + (k,)
        if isinstance(v, dict):
            assert k in ref_tree, f"{msg}: {p} missing in reference"
            _assert_imported_leaves_equal(v, merged[k], ref_tree[k], msg, p)
        else:
            if k not in ref_tree:
                continue  # leaf the torch model does not have (shape mismatch)
            a = np.asarray(merged[k]) if not isinstance(merged[k], dict) else None
            np.testing.assert_allclose(
                a, np.asarray(ref_tree[k]), rtol=1e-6, atol=1e-6,
                err_msg=f"{msg}: {p}")


def _fake_vit_ckpt(tmp_path, embed_dims=32, layers=2, patches=4):
    """A ViT-image checkpoint shaped like what init_from_vit_pretrain_ expects:
    the reference's own key naming minus temporal parts."""
    torch.manual_seed(3)
    sd = {}
    sd["cls_token"] = torch.randn(1, 1, embed_dims)
    sd["pos_embed"] = torch.randn(1, patches + 1, embed_dims)
    sd["patch_embed.projection.weight"] = torch.randn(embed_dims, 3, 16, 16)
    sd["patch_embed.projection.bias"] = torch.randn(embed_dims)
    for i in range(layers):
        base = f"transformer_layers.layers.{i}"
        sd[f"{base}.attentions.0.norm.weight"] = torch.randn(embed_dims)
        sd[f"{base}.attentions.0.norm.bias"] = torch.randn(embed_dims)
        sd[f"{base}.attentions.0.attn.qkv.weight"] = torch.randn(3 * embed_dims, embed_dims)
        sd[f"{base}.attentions.0.attn.qkv.bias"] = torch.randn(3 * embed_dims)
        sd[f"{base}.attentions.0.attn.proj.weight"] = torch.randn(embed_dims, embed_dims)
        sd[f"{base}.attentions.0.attn.proj.bias"] = torch.randn(embed_dims)
        sd[f"{base}.ffns.0.norm.weight"] = torch.randn(embed_dims)
        sd[f"{base}.ffns.0.norm.bias"] = torch.randn(embed_dims)
        sd[f"{base}.ffns.0.layers.0.0.weight"] = torch.randn(4 * embed_dims, embed_dims)
        sd[f"{base}.ffns.0.layers.0.0.bias"] = torch.randn(4 * embed_dims)
        sd[f"{base}.ffns.0.layers.1.weight"] = torch.randn(embed_dims, 4 * embed_dims)
        sd[f"{base}.ffns.0.layers.1.bias"] = torch.randn(embed_dims)
    sd["norm.weight"] = torch.randn(embed_dims)
    sd["norm.bias"] = torch.randn(embed_dims)
    path = str(tmp_path / "vit.pth")
    torch.save(sd, path)
    return path


@pytest.mark.parametrize("copy_strategy", ["repeat", "set_zero"])
def test_vit_import_timesformer_matches_reference(tmp_path, copy_strategy):
    ckpt = _fake_vit_ckpt(tmp_path)
    T = 2
    x = np.random.RandomState(0).randn(2, T, 3, 32, 32).astype(np.float32)

    torch.manual_seed(0)
    tmod = ref_vt.TimeSformer(num_frames=T, attention_type="divided_space_time",
                              copy_strategy=copy_strategy, **SMALL).eval()
    ref_wi.init_from_vit_pretrain_(tmod, ckpt, "Conv2d", "divided_space_time",
                                   copy_strategy)

    fmod = TimeSformer(num_frames=T, attention_type="divided_space_time", **SMALL)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    sd = load_torch_state_dict(ckpt)
    sd = surgery_from_vit_pretrain(sd, "Conv2d", "divided_space_time", copy_strategy)
    imported = torch_to_flax_params(sd)
    params, _, _ = merge_params(params, imported)

    # the reference torch model after its own surgery+load is the golden value:
    # every leaf we imported must equal the corresponding torch weight
    ref_tree = torch_to_flax_params(
        {k: v.detach().numpy() for k, v in tmod.state_dict().items()})
    _assert_imported_leaves_equal(imported, params, ref_tree,
                                  msg=f"vit import {copy_strategy}")

    # and the models agree end-to-end once the (randomly initialized,
    # not-in-ckpt) leaves are synchronized too
    params = torch_state_to_flax(tmod, params)
    out_j = fmod.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(x))
    assert_close(out_j, out_t, rtol=1e-4, atol=1e-4,
                 msg=f"vit import {copy_strategy}")


def test_vit_surgery_copies_spatial_to_temporal(tmp_path):
    """The surgery must duplicate attentions.0 -> attentions.1 (repeat) or
    zero it (set_zero) — weight_init.py:159-168."""
    ckpt = _fake_vit_ckpt(tmp_path)
    sd = load_torch_state_dict(ckpt)
    rep = surgery_from_vit_pretrain(dict(sd), "Conv2d", "divided_space_time", "repeat")
    zero = surgery_from_vit_pretrain(dict(sd), "Conv2d", "divided_space_time", "set_zero")
    k0 = "transformer_layers.layers.0.attentions.0.attn.qkv.weight"
    k1 = "transformer_layers.layers.0.attentions.1.attn.qkv.weight"
    np.testing.assert_array_equal(rep[k1], rep[k0])
    assert np.abs(zero[k1]).max() == 0.0


@pytest.mark.parametrize("extend_strategy", ["temporal_avg", "center_frame"])
def test_vivit_conv3d_inflation_matches_reference(tmp_path, extend_strategy):
    ckpt = _fake_vit_ckpt(tmp_path)
    T = 4
    x = np.random.RandomState(1).randn(2, T, 3, 32, 32).astype(np.float32)

    torch.manual_seed(0)
    tmod = ref_vt.ViViT(num_frames=T, attention_type="fact_encoder",
                        extend_strategy=extend_strategy, **SMALL).eval()
    ref_wi.init_from_vit_pretrain_(tmod, ckpt, "Conv3d", "fact_encoder",
                                   "repeat", extend_strategy, 2, 1)

    fmod = ViViT(num_frames=T, attention_type="fact_encoder",
                 num_time_transformer_layers=4, **SMALL)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    sd = load_torch_state_dict(ckpt)
    sd = surgery_from_vit_pretrain(sd, "Conv3d", "fact_encoder", "repeat",
                                   extend_strategy, 2, 1)
    imported = torch_to_flax_params(sd, "fact_encoder")
    params, _, _ = merge_params(params, imported)

    ref_tree = torch_to_flax_params(
        {k: v.detach().numpy() for k, v in tmod.state_dict().items()},
        "fact_encoder")
    if extend_strategy == "center_frame":
        # the reference's center_frame path zeroes the SOURCE weight through an
        # einops stride-0 view (weight_init.py:134-136) and ends with an
        # all-zero kernel; we implement the documented intent instead, so the
        # patch-embed leaf is compared structurally rather than to the buggy
        # reference value
        kernel = np.asarray(params["patch_embed"]["projection"]["kernel"])
        orig = load_torch_state_dict(ckpt)["patch_embed.projection.weight"]
        # flax layout (kt, kh, kw, i, o); center slice kt=1 holds the 2D kernel
        np.testing.assert_allclose(
            kernel[1], orig.transpose(2, 3, 1, 0), rtol=1e-6)
        assert np.abs(kernel[0]).max() == 0.0
        imported = {k: v for k, v in imported.items() if k != "patch_embed"}
    _assert_imported_leaves_equal(imported, params, ref_tree,
                                  msg=f"vivit inflation {extend_strategy}")


def test_kinetics_reload_roundtrip(tmp_path):
    """Save a lightning-style checkpoint from the torch reference model, load
    it through OUR kinetics import path, compare logits (the published-ckpt
    inference path, weight_init.py:305-315)."""
    T = 2
    x = np.random.RandomState(2).randn(1, T, 3, 32, 32).astype(np.float32)
    torch.manual_seed(1)
    tmod = ref_vt.TimeSformer(num_frames=T, **SMALL).eval()

    # lightning-style: 'model.' prefix (model_trainer saves self.model inside
    # the LightningModule state dict)
    sd = {f"model.{k}": v for k, v in tmod.state_dict().items()}
    path = str(tmp_path / "kinetics.pth")
    torch.save({"state_dict": sd}, path)

    fmod = TimeSformer(num_frames=T, **SMALL)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = init_from_kinetics_pretrain(params, path, verbose=False)

    out_j = fmod.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(x))
    assert_close(out_j, out_t, rtol=1e-4, atol=1e-4, msg="kinetics reload")
