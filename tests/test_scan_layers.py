"""-scan_layers (training/stacked_trainer.py ScanLayersTrainer): the block
stack as ONE lax.scan over stacked per-layer params. Must match the plain
unrolled trainer numerically, keep canonical (per-layer) checkpoints
interchangeable with dp/pp runs, and train under stochastic depth."""

from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videotransformer_tpu.parallel.mesh import shard_batch
from videotransformer_tpu.training.stacked_trainer import ScanLayersTrainer
from videotransformer_tpu.training.trainer import VideoTransformerTrainer

pytestmark = pytest.mark.slow  # heavy compiles


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
    la, treedef_a = jax.tree.flatten(a)
    lb, treedef_b = jax.tree.flatten(b)
    assert treedef_a == treedef_b, (treedef_a, treedef_b)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("mixup", [
    False, pytest.param(True, marks=pytest.mark.heavy)])
def test_scan_train_step_matches_unrolled(monkeypatch, mixup):
    """scan-over-layers full train step == unrolled train step: loss, the
    reference's per-parameter-clipped grad_norm, and the updated params
    (after unstacking) agree over 3 optimizer steps."""
    _patch_tiny_model(monkeypatch, layers=4)
    tr_dp = VideoTransformerTrainer(_cfg(mixup=mixup))
    tr_sc = ScanLayersTrainer(_cfg(mixup=mixup))

    batch_dp = _batch(tr_dp.mesh)
    batch_sc = _batch(tr_sc.mesh)
    for step in range(3):
        key = jax.random.fold_in(tr_dp.base_key, step)
        tr_dp.params, tr_dp.opt_state, s_dp = tr_dp._train_step(
            tr_dp.params, tr_dp.opt_state, batch_dp, key,
            jnp.float32(1e-3), jnp.float32(0.05))
        tr_sc.params, tr_sc.opt_state, s_sc = tr_sc._train_step(
            tr_sc.params, tr_sc.opt_state, batch_sc, key,
            jnp.float32(1e-3), jnp.float32(0.05))
        np.testing.assert_allclose(float(s_sc["loss"]), float(s_dp["loss"]),
                                   rtol=1e-4, err_msg=f"step {step}")
        np.testing.assert_allclose(
            float(s_sc["grad_norm"]), float(s_dp["grad_norm"]), rtol=1e-3,
            err_msg=f"step {step}")
    _assert_tree_close(tr_sc._canonical_params(), tr_dp.params)


def test_scan_eval_step_matches_unrolled(monkeypatch):
    _patch_tiny_model(monkeypatch, layers=4)
    tr_dp = VideoTransformerTrainer(_cfg())
    tr_sc = ScanLayersTrainer(_cfg())
    s_dp = tr_dp._eval_step(tr_dp.params, _batch(tr_dp.mesh), 1)
    s_sc = tr_sc._eval_step(tr_sc.params, _batch(tr_sc.mesh), 1)
    assert int(s_sc["bs"]) == int(s_dp["bs"]) == 8
    assert int(s_sc["top1"]) == int(s_dp["top1"])
    assert int(s_sc["top5"]) == int(s_dp["top5"])


def test_scan_stochastic_depth_trains(monkeypatch):
    """drop_path_rate > 0 under scan: the per-layer linspace rate rides the
    scan (BasicTransformerBlock dpr override) with per-layer dropout keys —
    the step runs, loss decreases, params move."""
    _patch_tiny_model(monkeypatch, layers=4)
    tr = ScanLayersTrainer(_cfg(drop_path_rate=0.2))
    batch = _batch(tr.mesh)
    before = np.asarray(
        jax.tree.leaves(tr.params["model"]["transformer_layers"])[0]).copy()
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


def test_scan_remat_matches(monkeypatch):
    """-remat under scan (jax.checkpoint on the scan body): identical loss
    to the non-remat scan step."""
    _patch_tiny_model(monkeypatch, layers=4)
    tr = ScanLayersTrainer(_cfg())
    tr_r = ScanLayersTrainer(_cfg(remat=True))
    batch = _batch(tr.mesh)
    batch_r = _batch(tr_r.mesh)
    key = jax.random.fold_in(tr.base_key, 0)
    tr.params, tr.opt_state, s = tr._train_step(
        tr.params, tr.opt_state, batch, key,
        jnp.float32(1e-3), jnp.float32(0.05))
    tr_r.params, tr_r.opt_state, s_r = tr_r._train_step(
        tr_r.params, tr_r.opt_state, batch_r, key,
        jnp.float32(1e-3), jnp.float32(0.05))
    np.testing.assert_allclose(float(s_r["loss"]), float(s["loss"]),
                               rtol=1e-5)
    _assert_tree_close(tr_r._canonical_params(), tr._canonical_params(),
                       rtol=1e-5, atol=1e-6)


def test_scan_checkpoint_interchanges_with_dp(monkeypatch, tmp_path):
    """scan checkpoints are canonical per-layer trees: a scan run's
    checkpoint loads into an unrolled dp trainer (and back)."""
    _patch_tiny_model(monkeypatch, layers=4)
    tr_sc = ScanLayersTrainer(_cfg())
    batch = _batch(tr_sc.mesh)
    key = jax.random.fold_in(tr_sc.base_key, 0)
    tr_sc.params, tr_sc.opt_state, _ = tr_sc._train_step(
        tr_sc.params, tr_sc.opt_state, batch, key,
        jnp.float32(1e-3), jnp.float32(0.05))
    path = str(tmp_path / "ckpt")
    tr_sc.save_checkpoint(path, block=True)

    tr_dp = VideoTransformerTrainer(_cfg())
    tr_dp.load_checkpoint(path)
    _assert_tree_close(tr_dp.params, tr_sc._canonical_params(),
                       rtol=1e-6, atol=1e-7)

    tr_sc2 = ScanLayersTrainer(_cfg())
    tr_sc2.load_checkpoint(path)
    _assert_tree_close(tr_sc2._canonical_params(), tr_sc._canonical_params(),
                       rtol=1e-6, atol=1e-7)
    leaf = jax.tree.leaves(tr_sc2.params["model"]["transformer_layers"])[0]
    assert leaf.shape[0] == 4  # stacked runtime layout restored


def test_cli_accepts_scan_layers(monkeypatch):
    from model_pretrain import parse_args

    args = parse_args([
        "-epoch", "1", "-batch_size", "2", "-num_class", "10",
        "-num_frames", "8", "-frame_interval", "16",
        "-objective", "supervised", "-arch", "timesformer",
        "-lr", "0.001", "-root_dir", "/tmp/x",
        "-train_data_path", "x.txt", "-scan_layers", "True"])
    assert args.scan_layers is True
