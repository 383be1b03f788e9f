"""A/B: MViT patchify conv (3,7,7)/s(2,4,4)/p(1,3,3) vs strided-slice im2col
+ matmul.

The MaskFeat step trace shows the conv formulation costing ~5.3 ms/step
(fwd 2.5 + wgrad 1.5 + input relayout 1.2) for ~17 GF of useful work — XLA's
TPU conv path struggles with C_in=3. The im2col formulation materializes the
147-tap patches (duplication ~8x of the video, ~350 MB bf16 — ~0.4 ms of HBM
traffic) and runs one (200704, 441) @ (441, 96) matmul; the weight gradient
is the transposed matmul on the same patches.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def time_fn(fn, *args, reps=30):
    """Device time per iteration, measured as one jit dispatch containing a
    scan whose body REALLY depends on the previous iteration: the first
    (large) argument is perturbed by 0*carry, and the carry is read from the
    output. Without that chain XLA hoists the loop-invariant body out of the
    scan and the measurement is one execution + the relay round-trip (the
    original version of this harness had exactly that bug)."""
    @jax.jit
    def run(*a):
        def body(c, _):
            perturbed = (a[0] + jnp.asarray(0.0 * c, a[0].dtype),) + a[1:]
            out = fn(*perturbed)
            return out.astype(jnp.float32).ravel()[0], None
        c, _ = lax.scan(body, jnp.float32(0.0), None, length=reps)
        return c

    np.asarray(run(*args))
    t0 = time.perf_counter()
    np.asarray(run(*args))
    return (time.perf_counter() - t0) / reps * 1000


B, T, H, W, C = 8, 16, 224, 224, 3
KD, KH, KW = 3, 7, 7
SD, SH, SW = 2, 4, 4
PD, PH, PW = 1, 3, 3
E = 96
OT, OH, OW = T // SD, H // SH, W // SW


def conv_fwd(x, k):
    # the shipped formulation (flax nn.Conv lowers to this); bf16 accumulate
    # here so the conv transpose rule type-checks under grad — if anything
    # that FAVORS the conv side of the A/B
    return lax.conv_general_dilated(
        x, k, (SD, SH, SW), [(PD, PD), (PH, PH), (PW, PW)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def im2col(x):
    xp = jnp.pad(x, ((0, 0), (PD, PD), (PH, PH), (PW, PW), (0, 0)))
    taps = []
    for dt in range(KD):
        for dy in range(KH):
            for dx in range(KW):
                taps.append(lax.slice(
                    xp,
                    (0, dt, dy, dx, 0),
                    (B, dt + SD * (OT - 1) + 1, dy + SH * (OH - 1) + 1,
                     dx + SW * (OW - 1) + 1, C),
                    (1, SD, SH, SW, 1)))
    # stack in (dt, dy, dx) order right before the channel axis -> the row
    # vector is (dt, dy, dx, c), matching the (KD, KH, KW, C, E) kernel
    p = jnp.stack(taps, axis=-2)  # (B, OT, OH, OW, KD*KH*KW, C)
    return p.reshape(B * OT * OH * OW, KD * KH * KW * C)


def mm_fwd(x, k):
    p = im2col(x)
    out = jnp.dot(p, k.reshape(-1, E), preferred_element_type=jnp.float32)
    return out.reshape(B, OT, OH, OW, E).astype(x.dtype)


def conv_step(x, k, g):
    # forward + weight gradient (input gradient is never needed: the video
    # is an input, not a differentiated value). g kept bf16 so the conv
    # transpose rule sees matching dtypes.
    def f(kk):
        return jnp.sum(conv_fwd(x, kk) * g.astype(jnp.bfloat16),
                       dtype=jnp.float32)
    return jax.grad(f)(k)


def mm_step(x, k, g):
    def f(kk):
        return jnp.sum(mm_fwd(x, kk) * g.astype(jnp.bfloat16),
                       dtype=jnp.float32)
    return jax.grad(f)(k)


def model_path_current(v, k, g):
    # the model's actual input path: fp32 (B,T,C,H,W) video -> transpose ->
    # bf16 conv. XLA folds the transpose into the conv's input layout.
    def f(kk):
        x = v.transpose(0, 1, 3, 4, 2).astype(jnp.bfloat16)
        return jnp.sum(conv_fwd(x, kk) * g.astype(jnp.bfloat16),
                       dtype=jnp.float32)
    return jax.grad(f)(k)


def model_path_barrier(v, k, g):
    # cast FIRST (half the relayout bytes), then pin the materialized NDHWC
    # array with an optimization barrier so the conv sees a clean layout
    def f(kk):
        x = v.astype(jnp.bfloat16).transpose(0, 1, 3, 4, 2)
        x = jax.lax.optimization_barrier(x)
        return jnp.sum(conv_fwd(x, kk) * g.astype(jnp.bfloat16),
                       dtype=jnp.float32)
    return jax.grad(f)(k)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, T, H, W, C), jnp.bfloat16)
    v = jnp.asarray(rng.rand(B, T, C, H, W), jnp.float32)
    k = jnp.asarray(rng.rand(KD, KH, KW, C, E) - 0.5, jnp.bfloat16)
    g = jnp.asarray(rng.rand(B, OT, OH, OW, E), jnp.float32)

    ref = np.asarray(conv_fwd(x, k), np.float32)
    got = np.asarray(mm_fwd(x, k), np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"fwd rel_err={err:.2e}", flush=True)

    for name, fn, args in [
        ("conv_fwd", conv_fwd, (x, k)),
        ("mm_fwd", mm_fwd, (x, k)),
        ("conv_fwd+wgrad", conv_step, (x, k, g)),
        ("mm_fwd+wgrad", mm_step, (x, k, g)),
        ("model_current", model_path_current, (v, k, g)),
        ("model_barrier", model_path_barrier, (v, k, g)),
    ]:
        ms = time_fn(fn, *args)
        print(f"{name:16s} {ms:7.3f} ms/iter", flush=True)


if __name__ == "__main__":
    sys.exit(main())
