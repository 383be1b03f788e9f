"""Trainer-integrated pipeline parallelism (training/pp_trainer.py): the full
supervised train step — device augment/mixup, GPipe forward, microbatch-
accumulated backward, per-parameter-clipped AdamW on pipe-sharded stacked
params — must match the plain data-parallel trainer numerically, and
checkpoints must stay interchangeable with dp runs (canonical per-layer
format)."""

from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videotransformer_tpu.parallel.mesh import shard_batch
from videotransformer_tpu.training.pp_trainer import PipelineTrainer
from videotransformer_tpu.training.trainer import VideoTransformerTrainer

pytestmark = pytest.mark.slow  # heavy compiles / full-scale / multi-process


def _cfg(**over):
    cfg = dict(
        objective="supervised", arch="timesformer",
        attention_type="divided_space_time",
        num_class=10, num_frames=2, img_size=32, batch_size=8, num_workers=1,
        optim_type="adamw", lr=1e-3, lr_schedule="cosine", warmup_epochs=1,
        min_lr=1e-6, weight_decay=0.05, weight_decay_end=0.05, clip_grad=1.0,
        seed=0, mixup=False, eval_metrics="finetune", layer_decay=1.0,
        drop_path_rate=0.0, sp=1, tp=1, pp=1, pp_microbatch=0,
    )
    cfg.update(over)
    return SimpleNamespace(**cfg)


def _patch_tiny_model(monkeypatch, layers=4):
    from videotransformer_tpu.models import TimeSformer
    from videotransformer_tpu.training import trainer as trainer_mod

    def tiny_build(configs):
        return TimeSformer(
            num_frames=configs.num_frames, img_size=configs.img_size,
            patch_size=16, embed_dims=32, num_heads=4,
            num_transformer_layers=layers,
            attention_type=configs.attention_type,
            drop_path_rate=getattr(configs, "drop_path_rate", 0.1))

    monkeypatch.setattr(trainer_mod, "build_model", tiny_build)


def _batch(mesh, b=8, seed=0, num_class=10):
    rng = np.random.RandomState(seed)
    video = rng.rand(b, 2, 3, 32, 32).astype(np.float32)
    labels = (np.arange(b) % num_class).astype(np.int32)
    return shard_batch(mesh, {"video": video, "label": labels})


def _assert_tree_close(a, b, rtol=5e-4, atol=1e-4):
    # tolerances sized for AdamW's near-zero-gradient sign sensitivity:
    # m/(sqrt(v)+eps) ~ +-1 for noise-dominated elements, so fp32
    # reduction-order differences (pipeline accumulates microbatches
    # sequentially) shift a few updates by O(1e-5) per step. Real sharding
    # bugs (missing psum, wrong slice) are O(1e-1) and still caught; the
    # tight checks are the loss/grad_norm asserts above.
    la, treedef_a = jax.tree.flatten(a)
    lb, treedef_b = jax.tree.flatten(b)
    assert treedef_a == treedef_b, (treedef_a, treedef_b)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


@pytest.mark.heavy
@pytest.mark.parametrize("mixup", [False, True])
def test_pp_train_step_matches_dp(monkeypatch, mixup):
    """dp4 x pp2 full train step == dp8 train step: loss, the reference's
    per-parameter-clipped grad_norm, and the updated params (after
    unstacking) all agree over 3 optimizer steps."""
    _patch_tiny_model(monkeypatch, layers=4)
    tr_dp = VideoTransformerTrainer(_cfg(mixup=mixup))
    tr_pp = PipelineTrainer(_cfg(mixup=mixup, pp=2))
    assert dict(tr_pp.mesh.shape) == {"data": 4, "seq": 1, "model": 1, "pipe": 2}

    batch_dp = _batch(tr_dp.mesh)
    batch_pp = _batch(tr_pp.mesh)
    for step in range(3):
        key = jax.random.fold_in(tr_dp.base_key, step)
        tr_dp.params, tr_dp.opt_state, s_dp = tr_dp._train_step(
            tr_dp.params, tr_dp.opt_state, batch_dp, key,
            jnp.float32(1e-3), jnp.float32(0.05))
        tr_pp.params, tr_pp.opt_state, s_pp = tr_pp._train_step(
            tr_pp.params, tr_pp.opt_state, batch_pp, key,
            jnp.float32(1e-3), jnp.float32(0.05))
        np.testing.assert_allclose(float(s_pp["loss"]), float(s_dp["loss"]),
                                   rtol=1e-4, err_msg=f"step {step}")
        np.testing.assert_allclose(
            float(s_pp["grad_norm"]), float(s_dp["grad_norm"]), rtol=1e-3,
            err_msg=f"step {step}")
    _assert_tree_close(tr_pp._canonical_params(), tr_dp.params)


def test_pp_params_physically_pipe_sharded(monkeypatch):
    _patch_tiny_model(monkeypatch, layers=4)
    tr = PipelineTrainer(_cfg(pp=2))
    leaf = jax.tree.leaves(tr.params["model"]["transformer_layers"])[0]
    assert leaf.shape[0] == 4
    assert "pipe" in str(leaf.sharding.spec), leaf.sharding
    # and the Adam moments share the layout
    mleaf = jax.tree.leaves(tr.opt_state.mu["model"]["transformer_layers"])[0]
    assert "pipe" in str(mleaf.sharding.spec), mleaf.sharding


def test_pp_eval_step_matches_dp(monkeypatch):
    _patch_tiny_model(monkeypatch, layers=4)
    tr_dp = VideoTransformerTrainer(_cfg())
    tr_pp = PipelineTrainer(_cfg(pp=2))
    s_dp = tr_dp._eval_step(tr_dp.params, _batch(tr_dp.mesh), 1)
    s_pp = tr_pp._eval_step(tr_pp.params, _batch(tr_pp.mesh), 1)
    assert int(s_pp["bs"]) == int(s_dp["bs"]) == 8
    assert int(s_pp["top1"]) == int(s_dp["top1"])
    assert int(s_pp["top5"]) == int(s_dp["top5"])


@pytest.mark.heavy
def test_pp_stochastic_depth_trains(monkeypatch):
    """drop_path_rate > 0 under pp: the per-layer linspace rate rides the
    stacked scan (BasicTransformerBlock dpr override) with per-(layer,
    microbatch) dropout keys — the step runs, loss decreases, params move."""
    _patch_tiny_model(monkeypatch, layers=4)
    tr = PipelineTrainer(_cfg(pp=2, drop_path_rate=0.2))
    batch = _batch(tr.mesh)
    before = jax.tree.leaves(tr.params["model"]["transformer_layers"])[0]
    before = np.asarray(before).copy()
    losses = []
    for step in range(6):
        key = jax.random.fold_in(tr.base_key, step)
        tr.params, tr.opt_state, stats = tr._train_step(
            tr.params, tr.opt_state, batch, key,
            jnp.float32(1e-3), jnp.float32(0.05))
        losses.append(float(stats["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    after = np.asarray(
        jax.tree.leaves(tr.params["model"]["transformer_layers"])[0])
    assert not np.allclose(before, after)


def test_pp_checkpoint_interchanges_with_dp(monkeypatch, tmp_path):
    """pp checkpoints are canonical per-layer trees: a pp run's checkpoint
    loads into a dp trainer (and back) with identical params/moments."""
    _patch_tiny_model(monkeypatch, layers=4)
    tr_pp = PipelineTrainer(_cfg(pp=2))
    batch = _batch(tr_pp.mesh)
    key = jax.random.fold_in(tr_pp.base_key, 0)
    tr_pp.params, tr_pp.opt_state, _ = tr_pp._train_step(
        tr_pp.params, tr_pp.opt_state, batch, key,
        jnp.float32(1e-3), jnp.float32(0.05))
    path = str(tmp_path / "ckpt")
    tr_pp.save_checkpoint(path, block=True)

    tr_dp = VideoTransformerTrainer(_cfg())
    tr_dp.load_checkpoint(path)
    _assert_tree_close(tr_dp.params, tr_pp._canonical_params(),
                       rtol=1e-6, atol=1e-7)

    # and back into a fresh pp trainer: stacked runtime layout restored
    tr_pp2 = PipelineTrainer(_cfg(pp=2))
    tr_pp2.load_checkpoint(path)
    _assert_tree_close(tr_pp2._canonical_params(), tr_pp._canonical_params(),
                       rtol=1e-6, atol=1e-7)
    leaf = jax.tree.leaves(tr_pp2.params["model"]["transformer_layers"])[0]
    assert leaf.shape[0] == 4 and "pipe" in str(leaf.sharding.spec)
    m2 = jax.tree.leaves(tr_pp2.opt_state.mu["model"]["transformer_layers"])[0]
    assert m2.shape[0] == 4


def test_pp_microbatch_count(monkeypatch):
    """-pp_microbatch 4 (more microbatches than stages, the bubble-shrinking
    config): still numerically identical to dp. Batch 16 so each data shard
    holds a whole microbatch row (16 / (data=4) / (M=4) = 1)."""
    _patch_tiny_model(monkeypatch, layers=4)
    tr_dp = VideoTransformerTrainer(_cfg())
    tr_pp = PipelineTrainer(_cfg(pp=2, pp_microbatch=4))
    assert tr_pp.pp_microbatches == 4
    batch_dp = _batch(tr_dp.mesh, b=16)
    batch_pp = _batch(tr_pp.mesh, b=16)
    key = jax.random.fold_in(tr_dp.base_key, 0)
    tr_dp.params, tr_dp.opt_state, s_dp = tr_dp._train_step(
        tr_dp.params, tr_dp.opt_state, batch_dp, key,
        jnp.float32(1e-3), jnp.float32(0.05))
    tr_pp.params, tr_pp.opt_state, s_pp = tr_pp._train_step(
        tr_pp.params, tr_pp.opt_state, batch_pp, key,
        jnp.float32(1e-3), jnp.float32(0.05))
    np.testing.assert_allclose(float(s_pp["loss"]), float(s_dp["loss"]),
                               rtol=1e-4)
    _assert_tree_close(tr_pp._canonical_params(), tr_dp.params)
