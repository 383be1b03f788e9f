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


@pytest.mark.parametrize("with_hog", [True, False])
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
