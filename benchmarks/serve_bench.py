"""Serving-path benchmark: the AOT-exported predictor behind the
dynamic-batching InferenceServer, on the real chip.

Measures what a deployment cares about (and what run_all's model benches
don't): end-to-end request latency through the batching queue at low load,
and sustained throughput + achieved batch sizes under concurrent load.

Prints one JSON line per scenario, run_all style.

Usage: python benchmarks/serve_bench.py [--concurrency 16] [--seconds 10]
"""

import argparse
import json
import os
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_artifact(tmp, input_mode="raw"):
    import jax
    import jax.numpy as jnp

    from videotransformer_tpu.models import TimeSformer
    from videotransformer_tpu.ops.blocks import ClassificationHead
    from videotransformer_tpu.serving.export import export_predictor

    model = TimeSformer(num_frames=8, img_size=224,
                        attention_type="divided_space_time",
                        dtype=jnp.bfloat16)
    head = ClassificationHead(400, 768, dtype=jnp.bfloat16)
    video = jnp.zeros((1, 8, 3, 224, 224), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), video)["params"]
    hp = jax.jit(head.init)(jax.random.PRNGKey(1),
                            jnp.zeros((1, 768)))["params"]
    # tpu-only export keeps the fused Pallas kernels in the artifact;
    # raw input mode ships 2.1 MB uint8 clips instead of 14.4 MB f32 crop
    # stacks (the transfer is the serving bottleneck, not the model)
    export_predictor(tmp, model, head, params, hp, num_frames=8,
                     num_class=400, n_crops=3, buckets=(1, 2, 4, 8),
                     platforms=("tpu",), input_mode=input_mode)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--concurrency", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--artifact", default=None,
                    help="reuse a prebuilt artifact dir (skips export)")
    ap.add_argument("--input_mode", default="raw", choices=("raw", "clips"))
    args = ap.parse_args()

    from videotransformer_tpu.serving import InferenceServer, load_predictor

    tmp = args.artifact or tempfile.mkdtemp(prefix="vt_serve_bench_")
    if not args.artifact:
        build_artifact(tmp, input_mode=args.input_mode)
    predictor = load_predictor(tmp, cache_dir=os.path.join(tmp, "jax_cache"))
    t0 = time.perf_counter()
    predictor.warmup()
    print(json.dumps({"config": "serving_warmup",
                      "artifact": tmp, "input_mode": predictor.input_mode,
                      "warmup_s": round(time.perf_counter() - t0, 1)}),
          flush=True)

    srv = InferenceServer(predictor, num_frames=8, n_crops=3, max_batch=8,
                          batch_window_ms=5.0)
    rng = np.random.RandomState(0)
    if predictor.input_mode == "raw":
        clip = (rng.rand(*predictor.input_shape) * 255).astype(np.uint8)
    else:
        clip = rng.rand(3, 8, 3, 224, 224).astype(np.float32)
    mode = predictor.input_mode

    # single-stream latency: one request in flight (the batching window
    # adds nothing when the queue is empty beyond its first-item bypass)
    lats = []
    srv.submit(clip).result(timeout=120)  # device wakeup
    for _ in range(20):
        t0 = time.perf_counter()
        srv.submit(clip).result(timeout=120)
        lats.append((time.perf_counter() - t0) * 1000)
    lats.sort()
    print(json.dumps({
        "config": f"serving_timesformer_b_3crop_{mode}_single_stream",
        "p50_request_ms": round(lats[len(lats) // 2], 1),
        "p90_request_ms": round(lats[int(len(lats) * 0.9)], 1),
    }), flush=True)

    # sustained throughput: N closed-loop clients for S seconds
    stop = time.perf_counter() + args.seconds
    done = [0] * args.concurrency
    req_lat = []
    lock = threading.Lock()

    def client(i):
        while time.perf_counter() < stop:
            t0 = time.perf_counter()
            srv.submit(clip).result(timeout=120)
            dt = (time.perf_counter() - t0) * 1000
            with lock:
                done[i] += 1
                req_lat.append(dt)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.concurrency)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    total = sum(done)
    req_lat.sort()
    snap = srv.stats.snapshot()
    print(json.dumps({
        "config": f"serving_timesformer_b_3crop_{mode}_concurrency{args.concurrency}",
        "clips_per_sec": round(total / wall, 1),
        "p50_request_ms": round(req_lat[len(req_lat) // 2], 1),
        "p99_request_ms": round(req_lat[int(len(req_lat) * 0.99)], 1),
        "batch_histogram": snap["batch_histogram"],
    }), flush=True)


if __name__ == "__main__":
    main()
