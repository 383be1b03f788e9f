"""A/B microbench for the fused spatial-MHSA kernel at the train hot shape.

The batch-8 train-step trace (trace_step.py) measures the MHSA kernel family
at 32.4 ms vs a ~26 ms useful-FLOP speed-of-light; the round-3 hypothesis
blamed the 197->256 lane padding of the N=197 score tiles plus fp32 softmax
VPU time, and proposed a cls-peeled N=196 layout (VERDICT r4 #1). The MXU
lane granule is 128, so BOTH 196 and 197 pad to 256 lanes — this bench
measures whether the peel hypothesis survives contact with the hardware
before any surgery is attempted, and which in-kernel micro-variants actually
move device time:

  a. shipped       — fused_prenorm_mhsa at N=197 (the production kernel)
  b. n196          — same kernel at N=196 (what a cls-peel would run; any
                     win must show up here BEFORE paying the peel's extra
                     glue: lse output, cls-row correction, concat)
  c. n192          — N=192 (sublane-aligned 24x8; isolates sublane padding)
  d. n128          — N=128 (the next lane granule down: the step function
                     the peel would need to cross to matter)

Two in-kernel micro-variants were A/B'd through this harness: deferred
softmax normalization (divide by the softmax sum after the PV matmul, on
the narrow (rows, head_dim) output instead of the lane-padded probability
tile) shipped into fused_mhsa_pallas.py as a strict VPU-work reduction;
a 2-sequences-per-program unroll measured within relay noise in both
directions across two runs and was rejected as complexity without a win.

Each timing is one jitted dispatch scanning `reps` iterations with a real
loop-carried dependency (see patchify_ab.time_fn for why).

Run on an idle host:  python benchmarks/mhsa_ab.py [--fwd-only]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from videotransformer_tpu.kernels import fused_mhsa_pallas as fm


def time_fn(fn, *args, reps=30):
    @jax.jit
    def run(*a):
        def body(c, _):
            perturbed = (a[0] + jnp.asarray(0.0 * c, a[0].dtype),) + a[1:]
            out = fn(*perturbed)
            return out.astype(jnp.float32).ravel()[0], None

        c, _ = lax.scan(body, jnp.float32(0.0), None, length=reps)
        return c

    np.asarray(run(*args))  # compile+warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1000  # ms/iter


def make_inputs(B, N, D, dtype=jnp.bfloat16, seed=0):
    rng = np.random.RandomState(seed)

    def arr(*s):
        return jnp.asarray(rng.randn(*s).astype(np.float32) * 0.02, dtype)

    x = arr(B, N, D)
    lns = jnp.ones((D,), dtype)
    lnb = jnp.zeros((D,), dtype)
    wqkv, bqkv = arr(D, 3 * D), arr(3 * D)
    wproj, bproj = arr(D, D), arr(D)
    return x, lns, lnb, wqkv, bqkv, wproj, bproj


def fwd_call(num_heads, scale, *args):
    return fm.fused_prenorm_mhsa(*args, num_heads, scale, 1e-5, False)


def fwd_bwd_call(num_heads, scale, *args):
    def loss(*a):
        return fm.fused_prenorm_mhsa(
            *a, num_heads, scale, 1e-5, False).astype(jnp.float32).sum()

    val, grads = jax.value_and_grad(loss, argnums=tuple(range(7)))(*args)
    return val + sum(g.astype(jnp.float32).ravel()[0] for g in grads)


def main():
    fwd_only = "--fwd-only" in sys.argv
    B, D, H = 64, 768, 12  # batch 8 x 8 frames, TimeSformer-B spatial rows
    scale = (D // H) ** -0.5

    print(f"B={B} D={D} heads={H} bf16  (train spatial-attention shape)")
    for name, n in [("a_shipped_n197", 197), ("b_n196", 196),
                    ("c_n192", 192), ("d_n128", 128)]:
        args = make_inputs(B, n, D)
        fms = time_fn(functools.partial(fwd_call, H, scale), *args)
        line = f"{name:16s} fwd {fms:7.3f} ms"
        if not fwd_only:
            bms = time_fn(functools.partial(fwd_bwd_call, H, scale), *args)
            line += f"   fwd+bwd {bms:7.3f} ms"
        # useful-FLOP rate (fwd): qkv + scores + pv + proj
        fl = B * (2 * n * D * 3 * D + 4 * n * n * D + 2 * n * D * D)
        line += f"   fwd_useful {fl / fms / 1e9:6.1f} TFLOP/s"
        print(line)


if __name__ == "__main__":
    sys.exit(main())
