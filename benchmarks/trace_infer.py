"""Capture a jax.profiler trace of an inference forward and print the
device-time breakdown — the inference twin of trace_step.py. Reuses
trace_step's chrome-trace parser.

Configs:
  --arch timesformer  — bench.py's headline TimeSformer-B 8x224 bf16 forward
  --arch mvit         — run_all.bench_mvit_inference's MViT-B supervised
                        features config (16x224 bf16, forward_features[:, 0])

Usage: python benchmarks/trace_infer.py [--arch mvit] [--batch 8]
       [--scans 4] [--reps 3]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from trace_step import analyze  # noqa: E402


def build(arch, batch, scans):
    rng = np.random.RandomState(0)
    if arch == "mvit":
        from videotransformer_tpu.models.maskfeat import MaskFeat

        model = MaskFeat(pool_q_stride_size=((1, 1, 2, 2), (3, 1, 2, 2)),
                         feature_dim=216, num_frames=16, dtype=jnp.bfloat16)
        videos = jnp.asarray(
            rng.rand(scans, batch, 16, 3, 224, 224), jnp.float32)
        params = jax.jit(
            lambda k, v: model.init(k, v, None, None, None, None))(
                jax.random.PRNGKey(0), videos[0])["params"]

        @jax.jit
        def infer_scan(p, xs):
            def body(c, v):
                feats = model.apply({"params": p}, v,
                                    method="forward_features")
                return c, feats[:, 0]
            _, o = jax.lax.scan(body, 0, xs)
            return o

        return infer_scan, (params, videos)

    from videotransformer_tpu.models import TimeSformer
    from videotransformer_tpu.ops.blocks import ClassificationHead

    model = TimeSformer(num_frames=8, img_size=224,
                        attention_type="divided_space_time",
                        dtype=jnp.bfloat16)
    head = ClassificationHead(400, 768, dtype=jnp.bfloat16)
    videos = jnp.asarray(rng.rand(scans, batch, 8, 3, 224, 224), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), videos[0])["params"]
    head_params = jax.jit(head.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 768)))["params"]

    @jax.jit
    def infer_scan(params, head_params, videos):
        def body(c, v):
            feats = model.apply({"params": params}, v)
            return c, head.apply({"params": head_params}, feats)
        _, out = jax.lax.scan(body, 0, videos)
        return out

    return infer_scan, (params, head_params, videos)


def run(arch, batch, scans, reps, trace_dir):
    infer_scan, args = build(arch, batch, scans)
    np.asarray(infer_scan(*args))  # compile+warm
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = infer_scan(*args)
    np.asarray(out)
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    n_clips = batch * scans * reps
    print(f"wall: {dt * 1e3:.1f} ms for {n_clips} clips "
          f"= {n_clips / dt:.1f} clips/s")
    return reps * scans  # "steps" for the per-batch breakdown


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="timesformer",
                    choices=("timesformer", "mvit"))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--scans", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--trace_dir", default="/tmp/vt_trace_infer")
    ap.add_argument("--analyze_only", action="store_true")
    args = ap.parse_args()
    steps = args.reps * args.scans
    if not args.analyze_only:
        steps = run(args.arch, args.batch, args.scans, args.reps,
                    args.trace_dir)
    analyze(args.trace_dir, steps, top=24)


if __name__ == "__main__":
    main()
