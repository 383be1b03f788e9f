"""End-to-end CLI integration: model_pretrain.single_run trains, validates,
tests, checkpoints, and resumes on the bundled demo clip with a tiny model."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compiles / CLI+serving integration

DEMO_MP4 = "/root/reference/demo/YABnJL_bDzw.mp4"


@pytest.mark.skipif(not os.path.exists(DEMO_MP4), reason="demo clip not present")
def test_single_run_supervised(tmp_path, monkeypatch):
    import jax

    from videotransformer_tpu.models import TimeSformer
    from videotransformer_tpu.parallel import mesh as mesh_mod
    from videotransformer_tpu.training import trainer as trainer_mod

    # tiny model + 1-device mesh so the torch-free CPU run stays fast
    def tiny_build(configs):
        return TimeSformer(
            num_frames=configs.num_frames, img_size=configs.img_size,
            patch_size=16, embed_dims=32, num_heads=4, num_transformer_layers=2,
            attention_type=configs.attention_type)

    monkeypatch.setattr(trainer_mod, "build_model", tiny_build)
    orig_create = mesh_mod.create_mesh
    monkeypatch.setattr(
        mesh_mod, "create_mesh",
        lambda *a, **k: orig_create(devices=jax.devices()[:1]) if not a and "devices" not in k else orig_create(*a, **k))
    # trainer imports create_mesh by name
    monkeypatch.setattr(
        trainer_mod, "create_mesh",
        lambda *a, **k: orig_create(devices=jax.devices()[:1]))

    ann = tmp_path / "ann.txt"
    # four samples so train (drop_last, batch 2) gets 2 steps
    ann.write_text("".join(f"{DEMO_MP4}\tabseiling\n" for _ in range(4)))

    import model_pretrain

    argv = [
        "-epoch", "1", "-batch_size", "2", "-num_workers", "1",
        "-num_class", "400", "-num_frames", "2", "-frame_interval", "4",
        "-img_size", "32", "-objective", "supervised", "-arch", "timesformer",
        "-lr", "0.01", "-warmup_epochs", "1", "-root_dir", str(tmp_path),
        "-train_data_path", str(ann), "-val_data_path", str(ann),
        "-test_data_path", str(ann), "-log_interval", "1",
    ]
    trainer = model_pretrain.single_run(argv)
    assert trainer.global_step == 2  # 4 samples / batch 2, drop_last
    assert trainer.val_meter.total == 4
    assert trainer.test_meter.total == 4

    # last_checkpoint written; resume restores epoch counter
    results = list((tmp_path / "results").iterdir())
    assert len(results) == 1
    ckpt_dir = results[0] / "ckpt"
    assert (ckpt_dir / "last_checkpoint").exists()

    # the run leaves a training log on disk like the reference's bundled
    # demo/log_arch_timesformer…txt (step lines + epoch summaries)
    log_file = results[0] / "log" / "train.log"
    assert log_file.exists()
    log_text = log_file.read_text()
    assert "loss" in log_text and "data_time" in log_text
    assert "of current validation epoch" in log_text

    trainer2 = model_pretrain.single_run(argv + ["-resume"])
    # resumed at epoch 1 == max_epochs -> no extra training steps
    assert trainer2.epoch == 1
    assert trainer2.global_step == 2


def test_resolve_resume_checkpoint(tmp_path):
    """Crash-robust resume: interrupted last_checkpoint writes (orbax tmp
    dirs) fall back to the newest complete checkpoint."""
    import os
    import time as _time

    from model_pretrain import _resolve_resume_checkpoint

    d = tmp_path / "ckpt"
    d.mkdir()
    # nothing there: points at (nonexistent) last_checkpoint
    assert _resolve_resume_checkpoint(str(d)).endswith("last_checkpoint")

    # orbax 0.11 names in-flight dirs '<name>.orbax-checkpoint-tmp-<ts>'
    (d / "last_checkpoint.orbax-checkpoint-tmp-1723900000").mkdir()
    assert not os.path.exists(_resolve_resume_checkpoint(str(d)))
    # legacy suffix-only naming must be excluded too
    (d / "last_checkpoint.orbax-checkpoint-tmp").mkdir()
    assert not os.path.exists(_resolve_resume_checkpoint(str(d)))

    (d / "old_ep_1").mkdir()
    _time.sleep(0.05)
    (d / "new_ep_2").mkdir()
    assert _resolve_resume_checkpoint(str(d)).endswith("new_ep_2")

    (d / "last_checkpoint").mkdir()
    assert _resolve_resume_checkpoint(str(d)).endswith("last_checkpoint")


@pytest.mark.skipif(not os.path.exists(DEMO_MP4), reason="demo clip not present")
def test_single_run_device_augment_and_eval(tmp_path, monkeypatch):
    """-device_augment True routes train AND val/test through the raw-clip
    device path: raw decode -> fused augment in the train step, device-side
    Resize+Center/ThreeCrop+Normalize in the eval step (loader wiring in
    data_module + the jitted eval steps)."""
    import jax

    from videotransformer_tpu.models import TimeSformer
    from videotransformer_tpu.parallel import mesh as mesh_mod
    from videotransformer_tpu.training import trainer as trainer_mod

    def tiny_build(configs):
        return TimeSformer(
            num_frames=configs.num_frames, img_size=configs.img_size,
            patch_size=16, embed_dims=32, num_heads=4, num_transformer_layers=2,
            attention_type=configs.attention_type)

    monkeypatch.setattr(trainer_mod, "build_model", tiny_build)
    orig_create = mesh_mod.create_mesh
    monkeypatch.setattr(
        trainer_mod, "create_mesh",
        lambda *a, **k: orig_create(devices=jax.devices()[:1]))

    ann = tmp_path / "ann.txt"
    ann.write_text("".join(f"{DEMO_MP4}\tabseiling\n" for _ in range(4)))

    import model_pretrain

    argv = [
        "-epoch", "1", "-batch_size", "2", "-num_workers", "1",
        "-num_class", "400", "-num_frames", "2", "-frame_interval", "4",
        "-img_size", "32", "-objective", "supervised", "-arch", "timesformer",
        "-lr", "0.01", "-warmup_epochs", "1", "-root_dir", str(tmp_path),
        "-train_data_path", str(ann), "-val_data_path", str(ann),
        "-test_data_path", str(ann), "-log_interval", "1",
        "-device_augment", "True", "-aug_scale", "0.5", "1.0",
    ]
    trainer = model_pretrain.single_run(argv)
    assert trainer.global_step == 2
    assert trainer.val_meter.total == 4   # one raw clip per sample
    assert trainer.test_meter.total == 4  # 3 device crops averaged per clip


@pytest.mark.skipif(not os.path.exists(DEMO_MP4), reason="demo clip not present")
@pytest.mark.heavy
def test_single_run_sequence_parallel(tmp_path, monkeypatch):
    """-sp 2 end to end through the CLI: dp4 x sp2 mesh over the 8 virtual
    devices, train + val + test with the sequence-parallel activation
    shardings live (parallel/sp.py)."""
    from videotransformer_tpu.models import TimeSformer
    from videotransformer_tpu.parallel import sp as vt_sp
    from videotransformer_tpu.training import trainer as trainer_mod

    def tiny_build(configs):
        return TimeSformer(
            num_frames=configs.num_frames, img_size=configs.img_size,
            patch_size=16, embed_dims=32, num_heads=4,
            num_transformer_layers=2,
            attention_type=configs.attention_type)

    monkeypatch.setattr(trainer_mod, "build_model", tiny_build)

    ann = tmp_path / "ann.txt"
    ann.write_text("".join(f"{DEMO_MP4}\tabseiling\n" for _ in range(8)))

    import model_pretrain

    argv = [
        "-epoch", "1", "-batch_size", "4", "-num_workers", "1",
        "-num_class", "400", "-num_frames", "2", "-frame_interval", "4",
        "-img_size", "32", "-objective", "supervised", "-arch", "timesformer",
        "-lr", "0.01", "-warmup_epochs", "1", "-root_dir", str(tmp_path),
        "-train_data_path", str(ann), "-val_data_path", str(ann),
        "-sp", "2", "-log_interval", "1",
    ]
    trainer = model_pretrain.single_run(argv)
    assert dict(trainer.mesh.shape) == {"data": 4, "seq": 2, "model": 1}
    assert vt_sp.active()
    assert trainer.global_step == 2  # 8 samples / batch 4
    assert trainer.val_meter.total == 8
    assert 0.0 <= trainer.val_meter.compute() <= 1.0
    vt_sp.disable_sequence_parallel()


@pytest.mark.skipif(not os.path.exists(DEMO_MP4), reason="demo clip not present")
@pytest.mark.heavy
def test_single_run_pipeline_parallel(tmp_path, monkeypatch):
    """-pp 2 end to end through the CLI: dp4 x pp2 mesh over the 8 virtual
    devices — PipelineTrainer selected, stacked block params pipe-sharded,
    train + val through the GPipe schedule, canonical checkpoint written."""
    import jax

    from videotransformer_tpu.models import TimeSformer
    from videotransformer_tpu.training import trainer as trainer_mod
    from videotransformer_tpu.training.pp_trainer import PipelineTrainer

    def tiny_build(configs):
        return TimeSformer(
            num_frames=configs.num_frames, img_size=configs.img_size,
            patch_size=16, embed_dims=32, num_heads=4,
            num_transformer_layers=2,
            attention_type=configs.attention_type)

    monkeypatch.setattr(trainer_mod, "build_model", tiny_build)

    ann = tmp_path / "ann.txt"
    ann.write_text("".join(f"{DEMO_MP4}\tabseiling\n" for _ in range(16)))

    import model_pretrain

    argv = [
        "-epoch", "1", "-batch_size", "8", "-num_workers", "1",
        "-num_class", "400", "-num_frames", "2", "-frame_interval", "4",
        "-img_size", "32", "-objective", "supervised", "-arch", "timesformer",
        "-lr", "0.01", "-warmup_epochs", "1", "-root_dir", str(tmp_path),
        "-train_data_path", str(ann), "-val_data_path", str(ann),
        "-pp", "2", "-log_interval", "1",
    ]
    trainer = model_pretrain.single_run(argv)
    assert isinstance(trainer, PipelineTrainer)
    assert dict(trainer.mesh.shape) == {
        "data": 4, "seq": 1, "model": 1, "pipe": 2}
    leaf = jax.tree.leaves(trainer.params["model"]["transformer_layers"])[0]
    assert leaf.shape[0] == 2 and "pipe" in str(leaf.sharding.spec)
    assert trainer.global_step == 2  # 16 samples / batch 8
    assert trainer.val_meter.total == 16
    assert 0.0 <= trainer.val_meter.compute() <= 1.0
    # the checkpoint on disk is canonical per-layer (dp-compatible)
    import glob

    ckpts = glob.glob(str(tmp_path / "results" / "*" / "ckpt" /
                          "last_checkpoint"))
    assert ckpts, "last_checkpoint not written"
