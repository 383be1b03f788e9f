"""Device-side RandAugment vs the host class, per op.

The reference trains with torchvision RandAugment when ``-auto_augment`` is
set (data_transform.py:518-529). The host twin (data/rand_augment.py) is the
numerics golden here: each of the 14 ops in the device implementation
(device_augment.ra_*) must match the host op at fp32 tolerance. Geometric
ops (shear/translate/rotate) tolerate a small fraction of single-pixel
nearest-rounding differences — cv2.warpAffine computes the inverse map in
10-bit fixed point while the device warp is exact float32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videotransformer_tpu.data import device_augment as da
from videotransformer_tpu.data import rand_augment as ra


def _clip(seed=0, t=3, h=48, w=56):
    rng = np.random.RandomState(seed)
    # structured content so equalize/autocontrast have a real histogram
    base = (rng.rand(t, h, w, 3) * 255).astype(np.float32)
    ramp = np.linspace(0, 80, w, dtype=np.float32)[None, None, :, None]
    return np.clip(base * 0.7 + ramp, 0, 255)


def _host_op(clip_thwc, name, mag):
    """Run one host RandAugment op on (T, H, W, C) [0,255] float."""
    aug = ra.RandAugment()
    aug._chosen = [(name, mag)]
    out = aug(clip_thwc.transpose(0, 3, 1, 2))  # host layout (T, C, H, W)
    return out.transpose(0, 2, 3, 1)


def _geometric_close(dev, host, max_diff_frac=0.01):
    """Nearest-neighbor warps: all but a tiny fraction of pixels bit-equal
    (rounding-boundary pixels differ by whole-pixel shifts)."""
    diff = np.abs(dev - host).max(axis=-1)  # (T, H, W)
    frac = (diff > 1e-3).mean()
    assert frac <= max_diff_frac, f"{frac:.4f} of pixels differ"


MAG = 9 / 30 * 0.3  # not used directly; per-op magnitudes below


@pytest.mark.parametrize("sign", [1.0, -1.0])
def test_shear_x_y(sign):
    clip = _clip(0)
    mag = sign * float(np.linspace(0.0, 0.3, 31)[9])
    for kw, name in ((dict(sx=mag), "ShearX"), (dict(sy=mag), "ShearY")):
        dev = np.asarray(jax.jit(
            lambda x: da.ra_shear(x, **{k: jnp.float32(v)
                                        for k, v in kw.items()}))(clip))
        host = _host_op(clip, name, mag)
        _geometric_close(dev, host)


@pytest.mark.parametrize("sign", [1.0, -1.0])
def test_translate_x_y(sign):
    clip = _clip(1)
    mag = sign * float(np.linspace(0.0, 150.0 / 331.0, 31)[9])
    h, w = clip.shape[1], clip.shape[2]
    dev = np.asarray(da.ra_translate(jnp.asarray(clip), tx=mag * w))
    host = _host_op(clip, "TranslateX", mag)
    # integer translation: exact
    np.testing.assert_allclose(dev, host, atol=1e-4)
    dev = np.asarray(da.ra_translate(jnp.asarray(clip), ty=mag * h))
    host = _host_op(clip, "TranslateY", mag)
    np.testing.assert_allclose(dev, host, atol=1e-4)


@pytest.mark.parametrize("sign", [1.0, -1.0])
def test_rotate(sign):
    clip = _clip(2)
    mag = sign * float(np.linspace(0.0, 30.0, 31)[9])
    dev = np.asarray(da.ra_rotate(jnp.asarray(clip), jnp.float32(mag)))
    host = _host_op(clip, "Rotate", mag)
    _geometric_close(dev, host)


@pytest.mark.parametrize("name,fn", [
    ("Brightness", da.ra_brightness),
    ("Color", da.ra_color),
    ("Contrast", da.ra_contrast),
])
def test_photometric(name, fn):
    clip = _clip(3)
    for sign in (1.0, -1.0):
        mag = sign * float(np.linspace(0.0, 0.9, 31)[9])
        dev = np.asarray(fn(jnp.asarray(clip), jnp.float32(mag)))
        host = _host_op(clip, name, mag)
        np.testing.assert_allclose(dev, host, atol=1e-2)


def test_sharpness():
    clip = _clip(4)
    for sign in (1.0, -1.0):
        mag = sign * float(np.linspace(0.0, 0.9, 31)[9])
        dev = np.asarray(da.ra_sharpness(jnp.asarray(clip), jnp.float32(mag)))
        host = _host_op(clip, "Sharpness", mag)
        np.testing.assert_allclose(dev, host, atol=1e-2)


def test_posterize():
    clip = _clip(5)
    bits = int(8 - round(9 / 7.5))
    dev = np.asarray(da.ra_posterize(jnp.asarray(clip), bits))
    host = _host_op(clip, "Posterize", float(bits))
    np.testing.assert_array_equal(dev, host)


def test_solarize():
    clip = _clip(6)
    thr = float(np.linspace(255.0, 0.0, 31)[9])
    dev = np.asarray(da.ra_solarize(jnp.asarray(clip), thr))
    host = _host_op(clip, "Solarize", thr)
    np.testing.assert_allclose(dev, host, atol=1e-4)


def test_autocontrast():
    clip = _clip(7)
    dev = np.asarray(da.ra_autocontrast(jnp.asarray(clip)))
    host = _host_op(clip, "AutoContrast", 0.0)
    np.testing.assert_allclose(dev, host, atol=1e-2)


def test_equalize():
    clip = _clip(8)
    dev = np.asarray(da.ra_equalize(jnp.asarray(clip)))
    host = _host_op(clip, "Equalize", 0.0)
    # cv2.equalizeHist lut reproduced exactly on the uint8-quantized input
    np.testing.assert_allclose(dev, host, atol=1e-4)


def test_rand_augment_clip_jits_and_is_clip_consistent():
    clip = _clip(9, t=4)
    out = np.asarray(jax.jit(da.rand_augment_clip)(
        jax.random.PRNGKey(0), jnp.asarray(clip)))
    assert out.shape == clip.shape
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 255.0
    # identical frames stay identical (one draw per clip)
    same = np.repeat(clip[:1], 4, axis=0)
    out2 = np.asarray(jax.jit(da.rand_augment_clip)(
        jax.random.PRNGKey(3), jnp.asarray(same)))
    for t in range(1, 4):
        np.testing.assert_array_equal(out2[0], out2[t])


def test_augment_batch_auto_augment_path():
    """-auto_augment x -device_augment: the fused batch path applies
    RandAugment (not color jitter) and stays jit-able and deterministic."""
    rng = np.random.RandomState(10)
    batch = (rng.rand(3, 2, 64, 80, 3) * 255).astype(np.uint8)
    out_aa = da.augment_batch(jax.random.PRNGKey(1), jnp.asarray(batch),
                              out_size=32, auto_augment=True)
    out_cj = da.augment_batch(jax.random.PRNGKey(1), jnp.asarray(batch),
                              out_size=32, auto_augment=False)
    assert out_aa.shape == (3, 2, 3, 32, 32)
    assert np.isfinite(np.asarray(out_aa)).all()
    # the two recipes genuinely differ
    assert np.abs(np.asarray(out_aa) - np.asarray(out_cj)).max() > 1e-3
    out_aa2 = da.augment_batch(jax.random.PRNGKey(1), jnp.asarray(batch),
                               out_size=32, auto_augment=True)
    np.testing.assert_array_equal(np.asarray(out_aa), np.asarray(out_aa2))


@pytest.mark.slow
@pytest.mark.heavy
def test_trainer_device_augment_respects_auto_augment(monkeypatch):
    """End to end through the jitted train step: -device_augment True
    -auto_augment 'rand_aug' changes the augmented pixels vs no auto_augment
    (the round-3 silent-drop bug), same params/key otherwise."""
    from types import SimpleNamespace

    from videotransformer_tpu.parallel.mesh import create_mesh, shard_batch
    from videotransformer_tpu.training.trainer import VideoTransformerTrainer

    def _cfg(auto_augment):
        return SimpleNamespace(
            objective="supervised", arch="timesformer",
            attention_type="divided_space_time", num_class=10, num_frames=2,
            img_size=32, patch_size=16, batch_size=2, num_workers=0,
            optim_type="adamw", lr=1e-3, lr_schedule="cosine",
            warmup_epochs=1, min_lr=1e-6, weight_decay=0.05,
            weight_decay_end=0.05, clip_grad=0.0, seed=0, mixup=False,
            eval_metrics="finetune", auto_augment=auto_augment,
            device_augment=True, depth=1, embed_dims=32, num_heads=2)

    mesh = create_mesh(devices=jax.devices()[:1])
    rng = np.random.RandomState(0)
    raw = (rng.rand(2, 2, 48, 64, 3) * 255).astype(np.uint8)
    batch = {"raw_video": raw, "label": np.asarray([0, 1], np.int32)}

    losses = {}
    for aa in (None, "rand_aug"):
        tr = VideoTransformerTrainer(_cfg(aa), ckpt_dir=None, mesh=mesh)
        sharded = shard_batch(tr.mesh, batch)
        key = jax.random.fold_in(tr.base_key, 7)
        _, _, stats = tr._train_step(
            tr.params, tr.opt_state, sharded, key,
            jnp.float32(1e-3), jnp.float32(0.05))
        losses[aa] = float(stats["loss"])
        assert np.isfinite(losses[aa])
    assert losses[None] != losses["rand_aug"], losses
