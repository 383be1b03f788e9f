"""Golden-value parity: full TimeSformer / ViViT forward vs the reference.

Small configs (2 layers, dim 32) so the torch reference runs fast on CPU; the
parity property is architecture-independent (same code paths as B/16).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import video_transformer as ref_vt  # /root/reference/video_transformer.py

from videotransformer_tpu.models.timesformer import TimeSformer
from videotransformer_tpu.models.vivit import ViViT
from parity_utils import torch_state_to_flax, assert_close

torch.manual_seed(0)


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


SMALL = dict(img_size=32, patch_size=16, embed_dims=32, num_heads=4,
             num_transformer_layers=2)


@pytest.mark.parametrize("attention_type", [
    "divided_space_time", "space_only", "joint_space_time",
])
@pytest.mark.parametrize("use_learnable_pos_emb", [True, False])
def test_timesformer_parity(attention_type, use_learnable_pos_emb):
    B, T = 2, 4
    tmod = ref_vt.TimeSformer(
        num_frames=T, attention_type=attention_type,
        use_learnable_pos_emb=use_learnable_pos_emb, **SMALL,
    ).eval()
    x = _rand(B, T, 3, 32, 32, seed=10)

    fmod = TimeSformer(
        num_frames=T, attention_type=attention_type,
        use_learnable_pos_emb=use_learnable_pos_emb, **SMALL,
    )
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = torch_state_to_flax(tmod, params, attention_type)

    out_j = fmod.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(x))
    assert_close(out_j, out_t, rtol=1e-4, atol=1e-4,
                 msg=f"timesformer {attention_type} learnable={use_learnable_pos_emb}")


def test_timesformer_return_cls_false():
    B, T = 2, 2
    tmod = ref_vt.TimeSformer(num_frames=T, return_cls_token=False, **SMALL).eval()
    x = _rand(B, T, 3, 32, 32, seed=11)
    fmod = TimeSformer(num_frames=T, return_cls_token=False, **SMALL)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = torch_state_to_flax(tmod, params)
    out_j = fmod.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(x))
    assert_close(out_j, out_t, rtol=1e-4, atol=1e-4, msg="mean-pool readout")


def test_timesformer_last_selfattention():
    B, T = 2, 2
    tmod = ref_vt.TimeSformer(num_frames=T, **SMALL).eval()
    x = _rand(B, T, 3, 32, 32, seed=12)
    fmod = TimeSformer(num_frames=T, **SMALL)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = torch_state_to_flax(tmod, params)
    attn_j = fmod.apply({"params": params}, jnp.asarray(x), return_attention=True)
    with torch.no_grad():
        attn_t = tmod.get_last_selfattention(torch.from_numpy(x))
    assert_close(attn_j, attn_t, rtol=1e-4, atol=1e-4, msg="last self-attention")


@pytest.mark.parametrize("attention_type", [
    "fact_encoder", "joint_space_time", "divided_space_time",
])
def test_vivit_parity(attention_type):
    B, T = 2, 4  # tube_size=2 -> 2 effective frames
    tmod = ref_vt.ViViT(
        num_frames=T, attention_type=attention_type, **SMALL,
    ).eval()
    x = _rand(B, T, 3, 32, 32, seed=13)

    fmod = ViViT(num_frames=T, attention_type=attention_type, **SMALL)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = torch_state_to_flax(tmod, params, attention_type)

    out_j = fmod.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(x))
    assert_close(out_j, out_t, rtol=1e-4, atol=1e-4, msg=f"vivit {attention_type}")


def test_vivit_threecrop_batch_quirk():
    """ThreeCrop-style batch=3 through fact_encoder must match the reference's
    x[:b, 0] cls-gather quirk exactly (video_transformer.py:515)."""
    B, T = 3, 4
    tmod = ref_vt.ViViT(num_frames=T, attention_type="fact_encoder", **SMALL).eval()
    x = _rand(B, T, 3, 32, 32, seed=14)
    fmod = ViViT(num_frames=T, attention_type="fact_encoder", **SMALL)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = torch_state_to_flax(tmod, params, "fact_encoder")
    out_j = fmod.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(x))
    assert_close(out_j, out_t, rtol=1e-4, atol=1e-4, msg="fact_encoder batch quirk")
