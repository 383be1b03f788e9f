"""MViT / MaskFeat tests: block schedule vs the reference's builder math,
pooling shapes, mask-token substitution, center-frame loss vs a reference-style
python loop, and a tiny pretrain step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videotransformer_tpu.models.maskfeat import MaskFeat
from videotransformer_tpu.models.mvit import (
    MultiScaleAttention, build_mvit_block_configs, round_width)

pytestmark = pytest.mark.slow  # heavy compiles / CLI+serving integration


def test_round_width():
    # values the reference path produces (video_transformer.py:755-761)
    assert round_width(96, 2.0, divisor=2) == 192
    assert round_width(1, 2.0) == 2
    assert round_width(96, 1.0) == 96
    assert round_width(192, 2.0, divisor=4) == 384


def test_block_schedule_matches_reference_math():
    """Trainer config: 2 pool stages, dim/head doubling at 1, 3, 14."""
    cfgs, final_dim = build_mvit_block_configs(
        depth=16, num_heads=1, patch_embed_dim=96,
        embed_dim_mul=[[1, 2.0], [3, 2.0], [14, 2.0]],
        atten_head_mul=[[1, 2.0], [3, 2.0], [14, 2.0]],
        pool_q_stride_size=[[1, 1, 2, 2], [3, 1, 2, 2]],
        pool_kv_stride_adaptive=[1, 8, 8],
        pool_kvq_kernel=[3, 3, 3])
    assert final_dim == 768
    dims = [c["dim"] for c in cfgs]
    heads = [c["num_heads"] for c in cfgs]
    assert dims[0] == 96 and dims[1] == 192 and dims[3] == 384
    assert dims[14] == 768 and dims[15] == 768
    assert heads[0] == 1 and heads[1] == 2 and heads[3] == 4 and heads[14] == 8
    # Q pooling only at blocks 1 and 3
    q_blocks = [i for i, c in enumerate(cfgs) if len(c["stride_q"]) > 0]
    assert q_blocks == [1, 3]
    # adaptive KV strides: [1,8,8] -> [1,4,4] at b1 -> [1,2,2] at b3
    assert cfgs[0]["stride_kv"] == (1, 8, 8)
    assert cfgs[1]["stride_kv"] == (1, 4, 4)
    assert cfgs[2]["stride_kv"] == (1, 4, 4)
    assert cfgs[3]["stride_kv"] == (1, 2, 2)
    assert cfgs[15]["stride_kv"] == (1, 2, 2)
    # every block has a KV pool with kernel 3x3x3
    assert all(c["kernel_kv"] == (3, 3, 3) for c in cfgs)


def test_multiscale_attention_pooling_shapes():
    B, T, H, W, dim, heads = 2, 4, 8, 8, 32, 2
    N = 1 + T * H * W
    x = jnp.asarray(np.random.RandomState(0).rand(B, N, dim), jnp.float32)
    attn = MultiScaleAttention(
        dim=dim, num_heads=heads, kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
        stride_q=(1, 2, 2), stride_kv=(1, 4, 4), has_cls_embed=True)
    params = attn.init(jax.random.PRNGKey(0), x, (T, H, W))["params"]
    out, new_thw = attn.apply({"params": params}, x, (T, H, W))
    assert new_thw == (4, 4, 4)
    assert out.shape == (B, 1 + 4 * 4 * 4, dim)
    # pooling convs are depthwise per head channel
    assert params["pool_q"]["conv"]["kernel"].shape == (3, 3, 3, 1, dim // heads)


TINY = dict(img_size=32, num_frames=4, depth=2,
            embed_dim_mul=((1, 2.0),), atten_head_mul=((1, 2.0),),
            pool_q_stride_size=((1, 1, 2, 2),),
            pool_kv_stride_adaptive=(1, 2, 2), pool_kvq_kernel=(3, 3, 3),
            feature_dim=2 * 27)


def _tiny_maskfeat():
    return MaskFeat(**TINY)


@pytest.mark.heavy
def test_maskfeat_forward_features_shapes():
    model = _tiny_maskfeat()
    x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 3, 32, 32), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, None, None, None, None)["params"]
    feats = model.apply({"params": params}, x, method="forward_features")
    # patch embed: T'=2, 8x8 spatial; final dim = 96*2 = 192
    assert feats.shape == (2, 1 + 2 * 8 * 8 // 4, 192)  # spatial pooled 2x2


@pytest.mark.heavy
def test_maskfeat_mask_substitution():
    model = _tiny_maskfeat()
    x = jnp.asarray(np.random.RandomState(0).rand(1, 4, 3, 32, 32), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, None, None, None, None)["params"]
    # downsample_rate = 2 -> mask grid is 8/2 = 4
    mask0 = jnp.zeros((1, 2, 4, 4), jnp.int32)
    mask1 = jnp.ones((1, 2, 4, 4), jnp.int32)
    f_none = model.apply({"params": params}, x, method="forward_features")
    f_zero = model.apply({"params": params}, x, mask0, method="forward_features")
    f_one = model.apply({"params": params}, x, mask1, method="forward_features")
    np.testing.assert_allclose(np.asarray(f_none), np.asarray(f_zero), atol=1e-6)
    assert np.abs(np.asarray(f_one) - np.asarray(f_none)).max() > 1e-3


def test_maskfeat_loss_matches_reference_loop():
    """Vectorized center-frame masked MSE == the reference's python loop
    (video_transformer.py:888-901)."""
    model = _tiny_maskfeat()
    rng = np.random.RandomState(0)
    B, T = 2, 4
    x = jnp.asarray(rng.rand(B, T, 3, 32, 32), jnp.float32)
    target = jnp.asarray(rng.rand(B, T, 4, 4, 27), jnp.float32)
    mask = jnp.asarray((rng.rand(B, 2, 4, 4) > 0.5).astype(np.int32))
    markers_list = [[[0, 1]], [[0, 1], [1, 1]]]
    from videotransformer_tpu.data.mask_generator import pad_cube_marker

    markers, counts = pad_cube_marker(markers_list, max_cubes=4)

    params = model.init(jax.random.PRNGKey(0), x, None, None, None, None)["params"]
    preds, loss = model.apply(
        {"params": params}, x, target, mask, jnp.asarray(markers),
        jnp.asarray(counts))
    assert preds.shape == (B, T, 4, 4, 27)

    # reference loop on numpy
    preds_np = np.asarray(preds)
    mask_np = np.repeat(np.asarray(mask), 2, axis=1).astype(np.float64)
    for i, mark_item in enumerate(markers_list):
        center_index = np.zeros(T, dtype=bool)
        for start_frame, span_frame in mark_item:
            center_index[start_frame * 2 + span_frame * 2 // 2] = 1
        mask_np[i, ~center_index] = 0
    ref_loss = ((preds_np - np.asarray(target)) ** 2).mean(-1)
    ref_loss = (ref_loss * mask_np).sum() / (mask_np.sum() + 1e-5)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)


@pytest.mark.heavy
def test_maskfeat_gradient_step():
    """One pretrain gradient step on the tiny config: loss finite, decoder and
    mask token receive gradients."""
    model = _tiny_maskfeat()
    rng = np.random.RandomState(0)
    B, T = 2, 4
    x = jnp.asarray(rng.rand(B, T, 3, 32, 32), jnp.float32)
    target = jnp.asarray(rng.rand(B, T, 4, 4, 27), jnp.float32)
    # mixed mask: all-ones would replace every token and (correctly) zero the
    # patch-embed gradient
    mask = jnp.asarray(
        (np.random.RandomState(1).rand(B, 2, 4, 4) > 0.5).astype(np.int32))
    markers = jnp.asarray([[[0, 1], [1, 1]]] * B, jnp.int32)
    counts = jnp.asarray([2] * B, jnp.int32)

    params = model.init(jax.random.PRNGKey(0), x, None, None, None, None)["params"]

    def loss_fn(p):
        _, loss = model.apply({"params": p}, x, target, mask, markers, counts)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert np.abs(np.asarray(grads["decoder_pred"]["kernel"])).max() > 0
    assert np.abs(np.asarray(grads["mask_token"])).max() > 0
    assert np.abs(np.asarray(grads["patch_embed"]["kernel"])).max() > 0


def test_maskfeat_full_config_shapes():
    """Real MaskFeat trainer config (2 pool stages, 16 frames, 224^2):
    output (B, 16, 14, 14, 108), embed_dims 768."""
    model = MaskFeat(pool_q_stride_size=((1, 1, 2, 2), (3, 1, 2, 2)),
                     feature_dim=2 * 2 * 2 * 3 * 9)
    assert model.embed_dims == 768
    assert model.downsample_rate == 4
    x = jnp.zeros((1, 16, 3, 224, 224), jnp.float32)
    mask = jnp.ones((1, 8, 14, 14), jnp.int32)
    markers = jnp.asarray([[[0, 2]]], jnp.int32)
    counts = jnp.asarray([1], jnp.int32)
    # feature_dim=216 splits as (dt=2, dc=108): per-frame targets are 108-dim
    target = jnp.zeros((1, 16, 14, 14, 108), jnp.float32)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, target, mask, markers, counts))
    # eval_shape of init: check decoder dims without running the full model
    p = params["params"]
    assert p["decoder_pred"]["kernel"].shape == (768, 216)
    assert p["mvit"]["cls_positional_encoding"]["pos_embed_spatial"].shape == (1, 56 * 56, 96)
    assert p["mvit"]["cls_positional_encoding"]["pos_embed_temporal"].shape == (1, 8, 96)
    assert p["mvit"]["blocks_15"]["norm2"]["scale"].shape == (768,)
