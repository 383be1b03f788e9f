"""Two-PROCESS distributed training test (the reference's 8-proc NCCL DDP
analogue, demo/log…txt:7-18): spawn two JAX processes with 4 virtual CPU
devices each, train the same tiny model on per-process local shards, and
assert the loss/grad_norm trajectories are identical across processes AND
equal to a single-process run over the full global batch — proving the
cross-process gradient all-reduce and shard_local_batch assembly."""

import pytest

import os
import re
import socket
import subprocess
import sys

import numpy as np

pytestmark = pytest.mark.slow  # heavy compiles / full-scale / multi-process

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_train_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _parse(out):
    steps = re.findall(r"STEP (\d+) loss ([\d.]+) grad_norm ([\d.]+)", out)
    assert "WORKER OK" in out, out[-2000:]
    parsed = {int(s): (float(l), float(g)) for s, l, g in steps}
    for phase in ("VAL", "TEST"):
        m = re.search(rf"{phase} top1 ([\d.]+) top5 ([\d.]+)", out)
        assert m, out[-2000:]
        parsed[phase] = (float(m.group(1)), float(m.group(2)))
    return parsed


@pytest.mark.heavy
def test_two_process_training_matches_single_process():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    r0, r1 = _parse(outs[0]), _parse(outs[1])
    assert set(r0) == {0, 1, "VAL", "TEST"} and r0 == r1, (r0, r1)

    # single-process ground truth on the same global batch (8 local devices
    # via conftest env)
    from types import SimpleNamespace

    import jax
    import jax.numpy as jnp

    from videotransformer_tpu.models import TimeSformer
    from videotransformer_tpu.parallel.mesh import shard_local_batch
    from videotransformer_tpu.training import trainer as trainer_mod

    orig_build = trainer_mod.build_model
    trainer_mod.build_model = lambda configs: TimeSformer(
        num_frames=2, img_size=32, patch_size=16, embed_dims=32, num_heads=4,
        num_transformer_layers=2, attention_type="divided_space_time")
    try:
        cfg = SimpleNamespace(
            objective="supervised", arch="timesformer",
            attention_type="divided_space_time", num_class=10, num_frames=2,
            img_size=32, batch_size=4, optim_type="adamw", lr=1e-3,
            lr_schedule="cosine", warmup_epochs=1, min_lr=1e-6,
            weight_decay=0.05, weight_decay_end=0.05, clip_grad=1.0, seed=0,
            mixup=False, eval_metrics="finetune", layer_decay=1.0)
        tr = trainer_mod.VideoTransformerTrainer(cfg, ckpt_dir=None)
        rng = np.random.RandomState(0)
        batch = shard_local_batch(tr.mesh, {
            "video": rng.rand(8, 2, 3, 32, 32).astype(np.float32),
            "label": (np.arange(8) % 10).astype(np.int32)})
        for step in range(2):
            key = jax.random.fold_in(tr.base_key, step)
            tr.params, tr.opt_state, stats = tr._train_step(
                tr.params, tr.opt_state, batch, key,
                jnp.float32(1e-3), jnp.float32(0.05))
            loss, gn = r0[step]
            np.testing.assert_allclose(float(stats["loss"]), loss, atol=2e-5)
            np.testing.assert_allclose(float(stats["grad_norm"]), gn,
                                       atol=2e-4)

        # eval-path ground truth: same global eval set through validate()
        # and the three-crop test() in ONE process must reproduce the
        # two-process global meters (multi-host _pad_eval_batch +
        # shard_local_batch evidence, model_trainer.py:254-299)
        erng = np.random.RandomState(1)
        eval_video = erng.rand(12, 2, 3, 32, 32).astype(np.float32)
        eval_labels = (np.arange(12) % 10).astype(np.int32)
        tr.do_eval = tr.do_test = True
        top1, top5 = tr.validate([{"video": eval_video, "label": eval_labels}])
        np.testing.assert_allclose((top1, top5), r0["VAL"], atol=1e-6)
        crops = np.stack([eval_video, eval_video * 0.9, eval_video * 1.1],
                         axis=1).reshape(36, 2, 3, 32, 32)
        t1, t5 = tr.test([{"video": crops, "label": eval_labels}])
        np.testing.assert_allclose((t1, t5), r0["TEST"], atol=1e-6)
    finally:
        trainer_mod.build_model = orig_build
