"""Golden-value parity: videotransformer_tpu.ops.blocks vs reference transformer.py.

Each test builds the reference torch module with a fixed seed, copies its
weights into the flax counterpart, and checks outputs to fp32 tolerance on the
same random input (SURVEY.md §7 stage 1 acceptance).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import transformer as ref  # /root/reference/transformer.py (read-only)

from videotransformer_tpu.ops import blocks
from parity_utils import torch_state_to_flax, assert_close

torch.manual_seed(0)


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def test_sine_cosine_pos_emb():
    ours = blocks.get_sine_cosine_pos_emb(197, 768)
    theirs = ref.get_sine_cosine_pos_emb(197, 768)
    assert_close(ours, theirs, msg="sinusoid table")


def test_attention_parity():
    dim, heads, B, N = 64, 4, 3, 17
    tmod = ref.Attention(dim, num_heads=heads, qkv_bias=True).eval()
    x = _rand(B, N, dim, seed=1)

    fmod = blocks.Attention(dim, num_heads=heads, qkv_bias=True)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = torch_state_to_flax(tmod, params)

    out_j, attn_j = fmod.apply({"params": params}, jnp.asarray(x), need_weights=True)
    with torch.no_grad():
        out_t, attn_t = tmod(torch.from_numpy(x))
    assert_close(out_j, out_t, msg="attention out")
    assert_close(attn_j, attn_t, msg="attention weights")


@pytest.mark.parametrize("use_cls_token", [False, True])
def test_divided_temporal_parity(use_cls_token):
    dim, heads, t, p, B = 32, 4, 4, 9, 2
    tmod = ref.DividedTemporalAttentionWithPreNorm(
        embed_dims=dim, num_heads=heads, num_frames=t, use_cls_token=use_cls_token,
        layer_drop=dict(type=ref.DropPath, dropout_p=0.0),
    ).eval()
    x = _rand(B, p * t + 1, dim, seed=2)

    fmod = blocks.DividedTemporalAttention(
        embed_dims=dim, num_heads=heads, num_frames=t, use_cls_token=use_cls_token
    )
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = torch_state_to_flax(tmod, params)

    out_j = fmod.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(x))
    assert_close(out_j, out_t, msg=f"divided temporal cls={use_cls_token}")


@pytest.mark.parametrize("use_cls_token", [False, True])
def test_divided_spatial_parity(use_cls_token):
    dim, heads, t, p, B = 32, 4, 4, 9, 2
    tmod = ref.DividedSpatialAttentionWithPreNorm(
        embed_dims=dim, num_heads=heads, num_frames=t, use_cls_token=use_cls_token,
        layer_drop=dict(type=ref.DropPath, dropout_p=0.0),
    ).eval()
    x = _rand(B, p * t + 1, dim, seed=3)

    fmod = blocks.DividedSpatialAttention(
        embed_dims=dim, num_heads=heads, num_frames=t, use_cls_token=use_cls_token
    )
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = torch_state_to_flax(tmod, params)

    out_j = fmod.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(x))
    assert_close(out_j, out_t, msg=f"divided spatial cls={use_cls_token}")


def test_joint_attention_parity():
    dim, heads, B, N = 32, 4, 2, 21
    tmod = ref.MultiheadAttentionWithPreNorm(
        embed_dims=dim, num_heads=heads,
        layer_drop=dict(type=ref.DropPath, dropout_p=0.0),
    ).eval()
    x = _rand(B, N, dim, seed=4)

    fmod = blocks.JointAttention(embed_dims=dim, num_heads=heads)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = torch_state_to_flax(tmod, params)

    out_j = fmod.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(x))
    assert_close(out_j, out_t, msg="joint attention")


def test_ffn_parity():
    dim, hidden, B, N = 32, 128, 2, 13
    tmod = ref.FFNWithPreNorm(embed_dims=dim, hidden_channels=hidden).eval()
    x = _rand(B, N, dim, seed=5)

    fmod = blocks.FFN(embed_dims=dim, hidden_channels=hidden)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = torch_state_to_flax(tmod, params)

    out_j = fmod.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(x))
    assert_close(out_j, out_t, rtol=1e-5, atol=1e-5, msg="ffn")


@pytest.mark.parametrize("conv_type", ["Conv2d", "Conv3d"])
def test_patch_embed_parity(conv_type):
    B, T, C, H, W = 2, 4, 3, 32, 32
    tmod = ref.PatchEmbed(img_size=32, patch_size=16, conv_type=conv_type).eval()
    x = _rand(B, T, C, H, W, seed=6)

    fmod = blocks.PatchEmbed(img_size=32, patch_size=16, conv_type=conv_type, embed_dims=768)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = torch_state_to_flax(tmod, params)

    out_j = fmod.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(x))
    assert_close(out_j, out_t, rtol=1e-4, atol=1e-4, msg=f"patch embed {conv_type}")


@pytest.mark.parametrize("operator_order", [
    ["time_attn", "space_attn", "ffn"],
    ["self_attn", "ffn"],
])
def test_container_parity(operator_order):
    dim, heads, t, p, B, L = 32, 4, 2, 4, 2, 3
    tmod = ref.TransformerContainer(
        num_transformer_layers=L, embed_dims=dim, num_heads=heads, num_frames=t,
        hidden_channels=dim * 4, operator_order=operator_order,
    ).eval()
    n = p * t + 1 if operator_order[0] == "time_attn" else 17
    x = _rand(B, n, dim, seed=7)

    fmod = blocks.TransformerContainer(
        num_transformer_layers=L, embed_dims=dim, num_heads=heads, num_frames=t,
        hidden_channels=dim * 4, operator_order=tuple(operator_order),
    )
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = torch_state_to_flax(tmod, params)

    out_j = fmod.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(x))
    assert_close(out_j, out_t, rtol=1e-4, atol=1e-4, msg=f"container {operator_order}")


def test_container_return_attention():
    dim, heads, t, p, B, L = 32, 4, 2, 4, 2, 2
    tmod = ref.TransformerContainer(
        num_transformer_layers=L, embed_dims=dim, num_heads=heads, num_frames=t,
        hidden_channels=dim * 4, operator_order=["time_attn", "space_attn", "ffn"],
    ).eval()
    x = _rand(B, p * t + 1, dim, seed=8)

    fmod = blocks.TransformerContainer(
        num_transformer_layers=L, embed_dims=dim, num_heads=heads, num_frames=t,
        hidden_channels=dim * 4, operator_order=("time_attn", "space_attn", "ffn"),
    )
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = torch_state_to_flax(tmod, params)

    attn_j = fmod.apply({"params": params}, jnp.asarray(x), return_attention=True)
    with torch.no_grad():
        attn_t = tmod(torch.from_numpy(x), return_attention=True)
    assert_close(attn_j, attn_t, rtol=1e-4, atol=1e-4, msg="last-layer attention weights")
