"""Capture a jax.profiler trace of the batch-8 finetune train step and print
the device-time breakdown by op category.

This is the measurement tool behind the README's MFU/glue claims (wall-clock
microbenchmarks are unreliable through the axon relay — the per-dispatch
round-trip is ~24 ms). Parses the captured xplane with
tensorboard_plugin_profile's converter (framework_op_stats) and aggregates
self-time by op name groups: Pallas kernel families, convs/matmuls, and
everything else ("glue": layout changes, elementwise chains, optimizer).

Usage: python benchmarks/trace_step.py [--batch 8] [--steps 3]
"""

import argparse
import glob
import gzip
import os
import sys
import time
from collections import defaultdict
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def run_traced_steps(batch_size, steps, trace_dir):
    from videotransformer_tpu.parallel.mesh import shard_batch
    from videotransformer_tpu.training.trainer import VideoTransformerTrainer

    cfg = SimpleNamespace(
        objective="supervised", arch="timesformer",
        attention_type="divided_space_time", num_class=400, num_frames=8,
        img_size=224, batch_size=batch_size, optim_type="adamw", lr=5e-3,
        lr_schedule="cosine", warmup_epochs=5, min_lr=1e-6, weight_decay=0.05,
        weight_decay_end=0.05, clip_grad=1.0, seed=0, mixup=True,
        eval_metrics="finetune", layer_decay=1.0, use_fp16=True,
        device_augment=True, data_statics="kinetics")
    tr = VideoTransformerTrainer(cfg, ckpt_dir=None)
    rng = np.random.RandomState(0)
    batch = shard_batch(tr.mesh, {
        "raw_video": (rng.rand(batch_size, 8, 256, 342, 3) * 255
                      ).astype(np.uint8),
        "label": (np.arange(batch_size) % 400).astype(np.int32)})

    def step(s):
        k = jax.random.fold_in(tr.base_key, s)
        return tr._train_step(tr.params, tr.opt_state, batch, k,
                              jnp.float32(5e-3), jnp.float32(0.05))

    for s in range(2):  # compile (donation causes one extra recompile)
        tr.params, tr.opt_state, st = step(s)
        np.asarray(st["loss"])
    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    for s in range(2, 2 + steps):
        tr.params, tr.opt_state, st = step(s)
    np.asarray(st["loss"])
    jax.profiler.stop_trace()
    wall_ms = (time.perf_counter() - t0) / steps * 1000
    print(f"wall per step: {wall_ms:.1f} ms")
    return wall_ms


def categorize(name):
    n = name.lower()
    if "custom-call" in n or "mosaic" in n or "tpu_custom_call" in n:
        return "pallas kernels"
    if n.startswith(("fusion", "loop_fusion", "input_fusion")):
        return "xla fusion (elementwise/glue)"
    if "conv" in n:
        return "convolution"
    if "dot" in n or "matmul" in n:
        return "matmul (xla)"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "layout/copy"
    if "all-reduce" in n or "psum" in n:
        return "collective"
    return "other"


def analyze(trace_dir, steps):
    files = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not files:
        print("no xplane captured (relay may not support device tracing)")
        return
    from tensorflow.python.profiler.internal import _pywrap_profiler_plugin  # noqa: F401
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    except ImportError:
        print("tensorboard_plugin_profile converter unavailable")
        return
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        files, "framework_op_stats", {"tqx": "out:csv;"})
    if isinstance(data, bytes):
        data = data.decode()
    import csv
    import io

    rows = list(csv.DictReader(io.StringIO(data)))
    by_cat = defaultdict(float)
    by_op = defaultdict(float)
    total = 0.0
    for r in rows:
        if r.get("host_or_device", "Device").lower().startswith("host"):
            continue
        t = float(r.get("total_self_time_in_us", r.get("self_time_us", 0)) or 0)
        name = r.get("type", r.get("operation", ""))
        by_cat[categorize(name)] += t
        by_op[name] += t
        total += t
    per_step = total / steps / 1000
    print(f"device total: {per_step:.1f} ms/step")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:34s} {t / steps / 1000:7.2f} ms/step "
              f"({100 * t / total:4.1f}%)")
    print("top ops:")
    for name, t in sorted(by_op.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {name[:60]:60s} {t / steps / 1000:7.2f} ms/step")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--trace_dir", default="/tmp/vt_trace")
    ap.add_argument("--analyze_only", action="store_true")
    args = ap.parse_args()
    if not args.analyze_only:
        os.makedirs(args.trace_dir, exist_ok=True)
        run_traced_steps(args.batch, args.steps, args.trace_dir)
    analyze(args.trace_dir, args.steps)


if __name__ == "__main__":
    main()
