"""MaskFeat (mim) training-step integration through the trainer, incl. the
device-side HOG target path, and mvit supervised paths."""

from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _cfg(**over):
    cfg = dict(
        objective="mim", arch="mvit", attention_type="divided_space_time",
        num_class=400, num_frames=4, img_size=64, batch_size=2, num_workers=1,
        optim_type="adamw", lr=8e-4, lr_schedule="cosine", warmup_epochs=1,
        min_lr=1e-6, weight_decay=0.05, weight_decay_end=0.05, clip_grad=0.0,
        seed=0, mixup=False, eval_metrics="finetune", layer_decay=0.75,
    )
    cfg.update(over)
    return SimpleNamespace(**cfg)


@pytest.fixture(scope="module")
def mim_trainer():
    import jax as _jax

    from videotransformer_tpu.parallel.mesh import create_mesh
    from videotransformer_tpu.training.trainer import VideoTransformerTrainer

    mesh = create_mesh(devices=_jax.devices()[:2])
    return VideoTransformerTrainer(_cfg(), ckpt_dir=None, mesh=mesh)


def _mim_batch(tr, with_hog):
    rng = np.random.RandomState(0)
    B, T = 2, 4
    video = rng.rand(B, T, 3, 64, 64).astype(np.float32)
    mask = (rng.rand(B, T // 2, 4, 4) > 0.6).astype(np.int32)
    markers = np.zeros((B, 8, 2), np.int32)
    markers[:, 0] = [0, 1]
    counts = np.ones((B,), np.int32)
    batch = {"video": video, "mask": mask, "cube_marker": markers,
             "cube_count": counts}
    if with_hog:
        batch["hog"] = rng.rand(B, T, 4, 4, 108).astype(np.float32)
    else:
        batch["raw"] = (video * 255).astype(np.float32)
    from videotransformer_tpu.parallel.mesh import shard_batch

    return shard_batch(tr.mesh, batch)


@pytest.mark.slow
@pytest.mark.parametrize("with_hog", [
    True, pytest.param(False, marks=pytest.mark.heavy)])
def test_mim_train_step(mim_trainer, with_hog):
    tr = mim_trainer
    batch = _mim_batch(tr, with_hog)
    key = jax.random.fold_in(tr.base_key, 0)
    params, opt_state, stats = tr._train_step(
        tr.params, tr.opt_state, batch, key, jnp.float32(8e-4), jnp.float32(0.05))
    assert np.isfinite(float(stats["loss"]))
    assert float(stats["grad_norm"]) > 0
    # donated buffers: refresh trainer state for the next parametrization
    tr.params, tr.opt_state = params, opt_state


DEMO_MP4 = "/root/reference/demo/YABnJL_bDzw.mp4"


@pytest.mark.skipif(not __import__("os").path.exists(DEMO_MP4),
                    reason="demo clip absent")
@pytest.mark.slow
def test_device_hog_matches_host_on_real_clip(tmp_path):
    """The device HOG target path (trainer input fusion) equals the host
    per-frame loop (reference dataset.py:39-45, 190-196) on a real decoded
    clip at fp32 tolerance — same crop, same mask draw."""
    import numpy as np

    from videotransformer_tpu.data import transforms as T
    from videotransformer_tpu.data.dataset import Kinetics
    from videotransformer_tpu.data.hog import batched_hog_targets

    ann = tmp_path / "ann.txt"
    ann.write_text(f"{DEMO_MP4}\tabseiling\n")
    cfg = _cfg(num_frames=4, img_size=64, num_samples_per_cls=1000)
    tf = T.create_video_transform(
        objective="mim", input_size=64, is_training=True, scale=(0.5, 1.0),
        color_jitter=None, interpolation="bicubic",
        mean=(0.45,) * 3, std=(0.225,) * 3)
    ds = Kinetics(cfg, str(ann), transform=tf,
                  temporal_sample=T.TemporalRandomCrop(8),
                  host_hog_targets=True)

    def draw(host):
        ds.host_hog_targets = host
        T.seed_transforms(11)
        ds._cube_generator.rng = np.random.default_rng(11)
        return ds[0]

    _, hog_host, mask_h, marker_h = draw(True)
    _, raw, mask_d, marker_d = draw(False)
    np.testing.assert_array_equal(mask_h, mask_d)
    assert marker_h == marker_d

    # device targets from the un-normalized pre-transform clip, at the cube
    # center frames only (what trainer._build_train_step computes)
    frames = raw.transpose(0, 2, 3, 1)  # (T, H, W, C)
    for start, span in marker_h:
        center = start * 2 + span * 2 // 2
        dev = np.asarray(batched_hog_targets(frames[center][None]))[0]
        np.testing.assert_allclose(dev, hog_host[center], atol=2e-3)
    # non-center frames are zero in the host buffer
    centers = {s * 2 + p * 2 // 2 for s, p in marker_h}
    for t in range(hog_host.shape[0]):
        if t not in centers:
            assert np.abs(hog_host[t]).max() == 0.0


@pytest.mark.skipif(not __import__("os").path.exists(DEMO_MP4),
                    reason="demo clip absent")
@pytest.mark.slow
@pytest.mark.heavy
def test_cli_mim_device_hog(tmp_path, monkeypatch):
    """-objective mim -device_hog True through the CLI: the data module stops
    computing host HOG, batches carry the raw clip, and the run trains
    (trainer.py device-HOG branch exercised end to end)."""
    import os

    from videotransformer_tpu.models.maskfeat import MaskFeat
    from videotransformer_tpu.parallel import mesh as mesh_mod
    from videotransformer_tpu.training import trainer as trainer_mod

    def _tiny(configs):
        return MaskFeat(
            img_size=configs.img_size, num_frames=configs.num_frames, depth=4,
            embed_dim_mul=((1, 2.0), (3, 2.0)),
            atten_head_mul=((1, 2.0), (3, 2.0)),
            pool_q_stride_size=((1, 1, 2, 2), (3, 1, 2, 2)),
            feature_dim=2 * 2 * 2 * 3 * 9)

    monkeypatch.setattr(trainer_mod, "build_model", _tiny)
    orig_create = mesh_mod.create_mesh
    monkeypatch.setattr(
        trainer_mod, "create_mesh",
        lambda *a, **k: orig_create(devices=jax.devices()[:1]))

    ann = tmp_path / "ann.txt"
    ann.write_text("".join(f"{DEMO_MP4}\tabseiling\n" for _ in range(4)))

    import model_pretrain

    argv = [
        "-epoch", "1", "-batch_size", "2", "-num_workers", "1",
        "-num_class", "400", "-num_frames", "6", "-frame_interval", "2",
        "-img_size", "64", "-objective", "mim", "-arch", "mvit",
        "-lr", "8e-4", "-warmup_epochs", "1", "-root_dir", str(tmp_path),
        "-train_data_path", str(ann), "-log_interval", "1",
        "-device_hog", "True",
    ]
    tr = model_pretrain.single_run(argv)
    assert tr.global_step == 2


def test_mim_device_augment_consistency(tmp_path):
    """The fully-device mim path (VERDICT r4 #2): augment_batch(with_raw=True)
    must return a (normalized, un-normalized) pair that are the SAME pixels —
    normalized == (raw/255 - mean)/std — and HOG targets computed from the
    device-augmented raw frames must equal the host HOG on those same frames,
    on a real decoded clip."""
    import os

    if not os.path.exists(DEMO_MP4):
        pytest.skip("demo clip absent")
    from videotransformer_tpu.data import transforms as T
    from videotransformer_tpu.data.dataset import Kinetics
    from videotransformer_tpu.data.device_augment import augment_batch
    from videotransformer_tpu.data.hog import (
        batched_hog_targets, extract_hog_features_np)

    ann = tmp_path / "ann.txt"
    ann.write_text(f"{DEMO_MP4}\tabseiling\n")
    cfg = _cfg(num_frames=4, img_size=64, num_samples_per_cls=1000)
    ds = Kinetics(cfg, str(ann), transform=None,
                  temporal_sample=T.TemporalRandomCrop(8), raw_clips=True)
    clip, mask, marker = ds[0]
    assert clip.dtype == np.uint8 and clip.shape[-1] == 3  # ONE uint8 clip

    mean, std = (0.45,) * 3, (0.225,) * 3
    video, raw = augment_batch(
        jax.random.PRNGKey(3), jnp.asarray(clip[None]), out_size=64,
        scale=(0.5, 1.0), hflip=0.5, color=(0, 0, 0, 0), mean=mean, std=std,
        with_raw=True)
    video, raw = np.asarray(video), np.asarray(raw)
    # pixel scale (bicubic overshoots [0,255] slightly — the host transform's
    # matmul resize does the same and HOG sees identical pixels)
    assert raw.min() > -30.0 and raw.max() < 290.0 and raw.max() > 100.0
    want = (raw / 255.0 - np.asarray(mean)[:, None, None]) \
        / np.asarray(std)[:, None, None]
    np.testing.assert_allclose(video, want, rtol=1e-5, atol=1e-5)

    # HOG target equality on the device-augmented pixels: device fused HOG
    # vs the host per-frame loop (reference dataset.py:39-45)
    frames = raw[0].transpose(0, 2, 3, 1)  # (T, H, W, C)
    for start, span in marker:
        center = start * 2 + span * 2 // 2
        dev = np.asarray(batched_hog_targets(jnp.asarray(frames[center][None])))[0]
        host = extract_hog_features_np(frames[center])
        np.testing.assert_allclose(dev, host, atol=2e-3)


def test_data_module_mim_device_augment_batches(tmp_path):
    """mim + -device_augment: the loader ships ONE uint8 canonical clip per
    sample (raw_video) plus host-drawn mask/cube_marker — no float 'video',
    no 'raw', no 'hog' (was: two float32 clips, VERDICT r4 weak #2)."""
    import os

    if not os.path.exists(DEMO_MP4):
        pytest.skip("demo clip absent")
    from videotransformer_tpu.training.data_module import KineticsDataModule

    ann = tmp_path / "ann.txt"
    ann.write_text("".join(f"{DEMO_MP4}\tabseiling\n" for _ in range(2)))
    cfg = _cfg(num_frames=4, img_size=64, frame_interval=2,
               num_samples_per_cls=1000, device_augment=True, num_workers=1,
               batch_size=2)
    dm = KineticsDataModule(cfg, train_ann_path=str(ann))
    assert dm.device_augment and dm.host_hog_targets is False
    batch = next(iter(dm.train_loader()))
    assert set(batch) == {"raw_video", "mask", "cube_marker", "cube_count"}
    assert batch["raw_video"].dtype == np.uint8
    assert batch["raw_video"].shape == (2, 4, 256, 342, 3)
    assert batch["mask"].shape == (2, 2, 4, 4)


@pytest.mark.skipif(not __import__("os").path.exists(DEMO_MP4),
                    reason="demo clip absent")
@pytest.mark.slow
@pytest.mark.heavy
def test_cli_mim_device_augment(tmp_path, monkeypatch):
    """-objective mim -device_augment True end to end: device geometric
    augment + device HOG + single-uint8-clip shipping through the CLI."""
    from videotransformer_tpu.models.maskfeat import MaskFeat
    from videotransformer_tpu.training import trainer as trainer_mod
    from videotransformer_tpu.parallel import mesh as mesh_mod

    def _tiny(configs):
        return MaskFeat(
            img_size=configs.img_size, num_frames=configs.num_frames, depth=4,
            embed_dim_mul=((1, 2.0), (3, 2.0)),
            atten_head_mul=((1, 2.0), (3, 2.0)),
            pool_q_stride_size=((1, 1, 2, 2), (3, 1, 2, 2)),
            feature_dim=2 * 2 * 2 * 3 * 9)

    monkeypatch.setattr(trainer_mod, "build_model", _tiny)
    orig_create = mesh_mod.create_mesh
    monkeypatch.setattr(
        trainer_mod, "create_mesh",
        lambda *a, **k: orig_create(devices=jax.devices()[:1]))

    ann = tmp_path / "ann.txt"
    ann.write_text("".join(f"{DEMO_MP4}\tabseiling\n" for _ in range(4)))

    import model_pretrain

    argv = [
        "-epoch", "1", "-batch_size", "2", "-num_workers", "1",
        "-num_class", "400", "-num_frames", "6", "-frame_interval", "2",
        "-img_size", "64", "-objective", "mim", "-arch", "mvit",
        "-lr", "8e-4", "-warmup_epochs", "1", "-root_dir", str(tmp_path),
        "-train_data_path", str(ann), "-log_interval", "1",
        "-device_augment", "True",
    ]
    tr = model_pretrain.single_run(argv)
    assert tr.global_step == 2


def test_tiny_grid_masks_never_empty(tmp_path):
    """At tiny test geometry (img 96 -> 6x6 grid, 14-patch budget) the
    BEiT rejection loop used to fail all attempts ~half the time because
    min_num_patches=16 exceeded the budget, yielding all-zero masks (loss 0,
    grad_norm 0 on real TPU smoke runs). dataset.py clamps the min to the
    budget; every drawn mask must be non-empty."""
    from videotransformer_tpu.data import transforms as T
    from videotransformer_tpu.data.dataset import Kinetics

    ann = tmp_path / "ann.txt"
    ann.write_text("x.mp4\tabseiling\n")
    cfg = _cfg(num_frames=8, img_size=96, num_samples_per_cls=1000)
    ds = Kinetics(cfg, str(ann), transform=None,
                  temporal_sample=T.TemporalRandomCrop(16), raw_clips=True)
    for _ in range(200):
        mask, marker = ds.mask_generator()
        assert mask.sum() > 0, "empty cube mask drawn"
        assert marker, "mask without marker"


def test_data_module_device_hog_batches(tmp_path):
    """KineticsDataModule with device_hog: host_hog_targets off, mim batches
    carry the raw clip ('raw'), not precomputed 'hog'."""
    import os

    if not os.path.exists(DEMO_MP4):
        pytest.skip("demo clip absent")
    from videotransformer_tpu.training.data_module import KineticsDataModule

    ann = tmp_path / "ann.txt"
    ann.write_text("".join(f"{DEMO_MP4}\tabseiling\n" for _ in range(2)))
    cfg = _cfg(num_frames=4, img_size=64, frame_interval=2,
               num_samples_per_cls=1000, device_hog=True, num_workers=1,
               batch_size=2)
    dm = KineticsDataModule(cfg, train_ann_path=str(ann))
    assert dm.host_hog_targets is False
    batch = next(iter(dm.train_loader()))
    assert "raw" in batch and "hog" not in batch
    assert batch["raw"].shape == (2, 4, 3, 64, 64)
    assert batch["video"].shape == (2, 4, 3, 64, 64)


@pytest.mark.slow
@pytest.mark.heavy
def test_mvit_supervised_features():
    """mvit supervised uses forward_features(x)[:, 0] (model_trainer.py:203-204)."""
    from videotransformer_tpu.training.trainer import VideoTransformerTrainer

    from videotransformer_tpu.parallel.mesh import create_mesh

    cfg = _cfg(objective="supervised", arch="mvit", num_class=10)
    mesh = create_mesh(devices=jax.devices()[:2])
    tr = VideoTransformerTrainer(cfg, ckpt_dir=None, mesh=mesh)
    # decoder_pred must be excluded from the optimized tree (frozen)
    assert "decoder_pred" not in tr._opt_subtree(tr.params)["model"]
    rng = np.random.RandomState(0)
    from videotransformer_tpu.parallel.mesh import shard_batch

    batch = shard_batch(tr.mesh, {
        "video": rng.rand(2, 4, 3, 64, 64).astype(np.float32),
        "label": np.asarray([1, 2], np.int32)})
    key = jax.random.fold_in(tr.base_key, 0)
    dec_before = jax.device_get(tr.params["model"]["decoder_pred"])
    tr.params, tr.opt_state, stats = tr._train_step(
        tr.params, tr.opt_state, batch, key, jnp.float32(1e-3), jnp.float32(0.05))
    assert np.isfinite(float(stats["loss"]))
    dec_after = jax.device_get(tr.params["model"]["decoder_pred"])
    for a, b in zip(jax.tree.leaves(dec_before), jax.tree.leaves(dec_after)):
        np.testing.assert_array_equal(a, b)
