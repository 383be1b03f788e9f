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


def run_traced_steps(batch_size, steps, trace_dir, config="finetune"):
    from videotransformer_tpu.parallel.mesh import shard_batch
    from videotransformer_tpu.training.trainer import VideoTransformerTrainer

    rng = np.random.RandomState(0)
    if config == "inference":
        # mirror bench.py's headline program: bf16 TimeSformer-B forward,
        # one scan over distinct batches inside a single dispatch
        from videotransformer_tpu.models import TimeSformer
        from videotransformer_tpu.ops.blocks import ClassificationHead

        model = TimeSformer(num_frames=8, img_size=224,
                            attention_type="divided_space_time",
                            dtype=jnp.bfloat16)
        head = ClassificationHead(400, 768, dtype=jnp.bfloat16)
        videos = jnp.asarray(
            rng.rand(4, batch_size, 8, 3, 224, 224), jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), videos[0])["params"]
        head_params = jax.jit(head.init)(
            jax.random.PRNGKey(1), jnp.zeros((1, 768)))["params"]

        @jax.jit
        def infer(params, head_params, videos):
            def body(c, v):
                feats = model.apply({"params": params}, v)
                return c, head.apply({"params": head_params}, feats)
            _, out = jax.lax.scan(body, 0, videos)
            return out

        np.asarray(infer(params, head_params, videos))  # compile
        t0 = time.perf_counter()
        jax.profiler.start_trace(trace_dir)
        for _ in range(steps):
            out = infer(params, head_params, videos)
        np.asarray(out)
        jax.profiler.stop_trace()
        wall_ms = (time.perf_counter() - t0) / steps * 1000
        print(f"wall per dispatch (4 batches of {batch_size}): {wall_ms:.1f} ms"
              f" = {4 * batch_size / wall_ms * 1000:.1f} clips/s")
        return wall_ms
    if config == "maskfeat":
        cfg = SimpleNamespace(
            objective="mim", arch="mvit", attention_type="divided_space_time",
            num_class=400, num_frames=16, img_size=224,
            batch_size=batch_size, optim_type="adamw", lr=8e-4,
            lr_schedule="cosine", warmup_epochs=5, min_lr=1e-6,
            weight_decay=0.05, weight_decay_end=0.05, clip_grad=0.0, seed=0,
            mixup=False, eval_metrics="finetune", layer_decay=0.75,
            use_fp16=True)
        tr = VideoTransformerTrainer(cfg, ckpt_dir=None)
        batch = shard_batch(tr.mesh, {
            "video": rng.rand(batch_size, 16, 3, 224, 224).astype(np.float32),
            "raw": (rng.rand(batch_size, 16, 3, 224, 224) * 255
                    ).astype(np.float32),
            "mask": (rng.rand(batch_size, 8, 14, 14) > 0.6).astype(np.int32),
            "cube_marker": np.tile(
                np.array([[[1, 2], [5, 1]] + [[0, 0]] * 6], np.int32),
                (batch_size, 1, 1)),
            "cube_count": np.full((batch_size,), 2, np.int32)})
    else:
        cfg = SimpleNamespace(
            objective="supervised", arch="timesformer",
            attention_type="divided_space_time", num_class=400, num_frames=8,
            img_size=224, batch_size=batch_size, optim_type="adamw", lr=5e-3,
            lr_schedule="cosine", warmup_epochs=5, min_lr=1e-6,
            weight_decay=0.05, weight_decay_end=0.05, clip_grad=1.0, seed=0,
            mixup=True, eval_metrics="finetune", layer_decay=1.0,
            use_fp16=True, device_augment=True, data_statics="kinetics")
        tr = VideoTransformerTrainer(cfg, ckpt_dir=None)
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


def base_name(name):
    """Merge per-layer HLO instances: 'ffns_0.40' -> 'ffns_0'."""
    root = name.rsplit(".", 1)
    if len(root) == 2 and root[1].isdigit():
        return root[0]
    return name


def categorize(name, long_name=""):
    n = name.lower()
    # the event name is the HLO instruction name (often just the flax module
    # path, e.g. MViT's "attn.62" / "blocks_15.3"); the long_name carries the
    # opcode — " custom-call(" identifies Pallas/Mosaic kernels reliably
    ln = long_name.lower()
    if ("custom-call" in n or "mosaic" in n or "tpu_custom_call" in n
            or " custom-call(" in ln or "= custom-call(" in ln
            or "_prenorm_mhsa" in n or "_mhsa_bwd" in n or "flash" in n
            or n.startswith(("ffns_", "ffn_bwd", "temporal_pack",
                             "blockdiag"))):
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


def analyze(trace_dir, steps, top=20):
    """Parse the chrome-trace json directly.

    The tensorboard_plugin_profile converter is broken in this environment
    (protobuf gencode mismatch), but the profiler also writes a chrome trace
    (*.trace.json.gz) whose "XLA Ops" thread carries one event per executed
    HLO with its device duration — that is all we need for a per-op
    breakdown. Wrapper events (jit_step, bare-number step markers) nest the
    real ops, so summing them would double count; drop them.
    """
    import json

    files = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not files:
        print("no trace.json.gz captured")
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # map (pid, tid) -> thread name; find the device "XLA Ops" thread(s)
    tnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e.get("pid"), e.get("tid"))] = e["args"].get("name", "")
    xla_tids = {k for k, v in tnames.items() if v == "XLA Ops"}
    by_cat = defaultdict(float)
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in xla_tids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_") or name.replace(".", "").isdigit():
            continue  # program wrapper / step marker: nests the real ops
        if name.split(".")[0] in ("while", "conditional", "body", "cond"):
            continue  # control-flow wrapper (lax.scan/while/cond): its
            # duration covers every iteration, whose inner HLOs are already
            # reported as their own events — summing both double counts
        dur_ms = e.get("dur", 0) / 1000.0
        long_name = (e.get("args") or {}).get("long_name", "")
        by_cat[categorize(name, long_name)] += dur_ms
        by_op[base_name(name)] += dur_ms
        total += dur_ms
    per_step = total / steps
    print(f"device total: {per_step:.1f} ms/step")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:34s} {t / steps:7.2f} ms/step "
              f"({100 * t / total:4.1f}%)")
    print("top ops:")
    for name, t in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {name[:76]:76s} {t / steps:7.2f} ms/step")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--trace_dir", default="/tmp/vt_trace")
    ap.add_argument("--analyze_only", action="store_true")
    ap.add_argument("--config", default="finetune",
                    choices=("finetune", "maskfeat", "inference"))
    args = ap.parse_args()
    if not args.analyze_only:
        os.makedirs(args.trace_dir, exist_ok=True)
        run_traced_steps(args.batch, args.steps, args.trace_dir,
                         config=args.config)
    analyze(args.trace_dir, args.steps)


if __name__ == "__main__":
    main()
