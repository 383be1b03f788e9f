"""Device-side fused augmentation tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videotransformer_tpu.data.device_augment import (
    augment_batch, augment_clip, resized_crop, rrc_params)


def test_resized_crop_matches_host_resize():
    """Static crop box through the traced-weight path == host matmul resize."""
    from videotransformer_tpu.data.interpolation import resize_hw

    rng = np.random.RandomState(0)
    clip = rng.rand(2, 64, 80, 3).astype(np.float32) * 255
    out = resized_crop(jnp.asarray(clip), 8.0, 10.0, 48.0, 60.0, 32, 32)
    ref = resize_hw(clip[:, 8:56, 10:70].transpose(0, 3, 1, 2), 32, 32,
                    "bicubic").transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=0.05)


def test_rrc_params_within_bounds():
    H, W = 256, 320
    for seed in range(20):
        top, left, h, w = rrc_params(
            jax.random.PRNGKey(seed), H, W, (0.08, 1.0), (3 / 4, 4 / 3))
        top, left, h, w = map(float, (top, left, h, w))
        assert 0 <= top and top + h <= H + 1e-6, (top, h)
        assert 0 <= left and left + w <= W + 1e-6, (left, w)
        assert h > 0 and w > 0
        area_frac = h * w / (H * W)
        assert 0.05 <= area_frac <= 1.01


def test_augment_batch_shapes_and_stats():
    rng = np.random.RandomState(1)
    batch = (rng.rand(4, 2, 64, 80, 3) * 255).astype(np.uint8)
    out = augment_batch(jax.random.PRNGKey(0), jnp.asarray(batch), out_size=32)
    assert out.shape == (4, 2, 3, 32, 32)
    o = np.asarray(out)
    assert np.isfinite(o).all()
    assert -3.0 < o.mean() < 3.0  # normalized scale
    # clip-consistent: within one clip both frames share crop geometry; the
    # per-clip keys differ so clips differ from each other
    assert np.abs(o[0] - o[1]).max() > 1e-3
    # deterministic under the same key
    out2 = augment_batch(jax.random.PRNGKey(0), jnp.asarray(batch), out_size=32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_augment_clip_consistency():
    """The same frame repeated across T must stay identical after augmenting
    (one random draw per clip, data_transform.py randomize_parameters
    semantics)."""
    rng = np.random.RandomState(2)
    frame = (rng.rand(64, 80, 3) * 255).astype(np.uint8)
    clip = np.stack([frame] * 4)
    out = augment_clip(jax.random.PRNGKey(3), jnp.asarray(clip), out_size=32)
    o = np.asarray(out)
    for t in range(1, 4):
        np.testing.assert_allclose(o[0], o[t], atol=1e-5)
