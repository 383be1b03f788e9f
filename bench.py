"""Benchmark: TimeSformer-B 8x224^2 K400 inference clips/sec/chip.

Baseline (BASELINE.md): the PyTorch reference sustains ~16.9 clips/s/GPU
fwd+bwd in its 8-GPU training log; the BASELINE.json north star is
>= 5x PyTorch-GPU clips/sec/chip for TimeSformer-B 8x224^2 *inference*.
The reference's own inference rate is bounded by its train step rate; we use
16.9 clips/s as the per-chip baseline denominator (conservative: inference-only
torch would be faster, but this is the only published per-device number; the
honest like-for-like ratio is the train-step rows in README.md).

Measurement design: ONE jit dispatch containing a reps x n_batches scan so
the axon relay's per-dispatch round-trip (~24 ms) amortizes over the whole
run instead of once per rep. The outer scan carries the previous iteration's
logit sum into the cls_token parameter (+ 0 * c) — a loop-carried data
dependency that stops XLA hoisting the loop-invariant forward out of the
scan, at the cost of one 768-element add per rep.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_CLIPS_PER_SEC_PER_GPU = 16.9

# Latest measured batch-8 train-step rate (mixup + device augment) from
# README.md's benchmark matrix — re-measure with benchmarks/bench_train.py
# and update when the train path changes.
TRAIN_STEP_CLIPS_PER_SEC = 78.0


def main():
    import jax
    import jax.numpy as jnp

    from videotransformer_tpu.models import TimeSformer
    from videotransformer_tpu.ops.blocks import ClassificationHead

    model = TimeSformer(num_frames=8, img_size=224,
                        attention_type="divided_space_time",
                        dtype=jnp.bfloat16)
    head = ClassificationHead(400, 768, dtype=jnp.bfloat16)

    batch = 8
    n_batches = 4
    reps = 32  # 1024 clips/dispatch: relay round-trip < 1% of the window
                # (reps=16 measured 336.6, 32 measured 338.8; batch 16 is
                # WORSE — 310 clips/s — the fused kernels' VMEM working set
                # spills past the sweet spot)
    videos = jnp.asarray(
        np.random.RandomState(0).rand(n_batches, batch, 8, 3, 224, 224),
        jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), videos[0])["params"]
    head_params = jax.jit(head.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 768)))["params"]

    @jax.jit
    def infer_sustained(params, head_params, videos):
        def outer(c, _):
            p = dict(params)
            # loop-carried dependency (see module docstring); 0 * c keeps the
            # numerics bit-identical while making every rep depend on the last
            p["cls_token"] = params["cls_token"] + 0.0 * c

            def body(cc, v):
                feats = model.apply({"params": p}, v)
                return cc, head.apply({"params": head_params}, feats)

            _, out = jax.lax.scan(body, 0, videos)
            return out.astype(jnp.float32).sum(), out[-1]

        c, last = jax.lax.scan(outer, jnp.float32(0.0), None, length=reps)
        return c, last

    # warmup / compile (np.asarray forces a real device->host sync; on the
    # axon relay platform block_until_ready can return before execution)
    np.asarray(infer_sustained(params, head_params, videos)[0])

    # steady-state throughput: 1024 clips in one dispatch; the single relay
    # round-trip is ~24 ms of a ~3 s run (<1%). Median-of-3 is robust to a
    # tunnel hiccup landing inside one timing window without the optimism of
    # best-of-3.
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        c, _ = infer_sustained(params, head_params, videos)
        np.asarray(c)
        dt = time.perf_counter() - t0
        rates.append(batch * n_batches * reps / dt)
    clips_per_sec = sorted(rates)[1]

    print(json.dumps({
        "metric": "timesformer_b_8f_224_inference_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC_PER_GPU, 2),
        # like-for-like context: the denominator above is the reference's
        # TRAIN-step rate (its only published per-device number). The honest
        # train-vs-train comparison lives in README.md's train-step rows;
        # vs_baseline_train_like_for_like reproduces the latest measured one
        # so the flattering inference ratio never travels alone.
        "train_step_clips_per_sec": TRAIN_STEP_CLIPS_PER_SEC,
        "vs_baseline_train_like_for_like": round(
            TRAIN_STEP_CLIPS_PER_SEC / BASELINE_CLIPS_PER_SEC_PER_GPU, 2),
    }))


if __name__ == "__main__":
    main()
