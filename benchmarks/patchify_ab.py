"""A/B microbench for the PatchEmbed patchify+projection on TPU.

The inference trace (trace_step.py --config inference) shows the patch
embedding running ~16 TFLOP/s against a ~146 TFLOP/s sustained matmul rate —
it is layout-bound, not FLOP-bound. Candidates:

  a. shipped: fp32 (b*t,c,gh,ps,gw,ps) transpose -> reshape -> bf16 matmul
  b. cast to bf16 BEFORE the transpose (halves the relayout bytes;
     bit-identical output: cast is elementwise)
  c. einsum directly on the blocked layout (XLA picks the contraction
     layout; no materialized transpose)
  d. lax.conv_general_dilated stride=16 on NCHW (the conv formulation the
     matmul replaced; forward only)

Each variant runs `reps` iterations inside ONE jitted scan so the wall time
is device time (single relay round-trip amortized over the scan).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def time_fn(fn, *args, reps=50):
    """One jit dispatch containing a scan with a REAL loop-carried dependency:
    the input is perturbed by 0*carry and the carry is read from the output.
    (An earlier version carried `c + out[0]*0`, which leaves the body
    loop-invariant — XLA hoists it out of the scan and the measurement
    collapses to one execution + the relay round-trip.)"""
    @jax.jit
    def run(*a):
        def body(c, _):
            perturbed = (a[0] + jnp.asarray(0.0 * c, a[0].dtype),) + a[1:]
            out = fn(*perturbed)
            return out.astype(jnp.float32).ravel()[0], None
        c, _ = lax.scan(body, jnp.float32(0.0), None, length=reps)
        return c

    np.asarray(run(*args))  # compile+warm
    t0 = time.perf_counter()
    np.asarray(run(*args))
    return (time.perf_counter() - t0) / reps * 1000  # ms/iter


def main():
    bt, c, h, w, ps, e = 64, 3, 224, 224, 16, 768
    gh = gw = h // ps
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(bt, c, h, w), jnp.float32)
    kernel = jnp.asarray(rng.rand(ps * ps * c, e), jnp.float32)
    kbf = kernel.astype(jnp.bfloat16)
    kconv = kernel.reshape(ps, ps, c, e).transpose(3, 2, 0, 1).astype(
        jnp.bfloat16)  # OIHW

    def a_shipped(x, k):
        y = x.reshape(bt, c, gh, ps, gw, ps)
        y = y.transpose(0, 2, 4, 3, 5, 1).reshape(bt, gh * gw, ps * ps * c)
        return jnp.dot(y.astype(jnp.bfloat16), k,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def b_cast_first(x, k):
        y = x.astype(jnp.bfloat16).reshape(bt, c, gh, ps, gw, ps)
        y = y.transpose(0, 2, 4, 3, 5, 1).reshape(bt, gh * gw, ps * ps * c)
        return jnp.dot(y, k,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def c_einsum(x, k):
        y = x.astype(jnp.bfloat16).reshape(bt, c, gh, ps, gw, ps)
        k4 = k.reshape(ps, ps, c, e)
        out = jnp.einsum("bcgpwq,pqce->bgwe", y, k4,
                         preferred_element_type=jnp.float32)
        return out.reshape(bt, gh * gw, e).astype(jnp.bfloat16)

    def d_conv(x, k):
        out = lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k, (ps, ps), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NHWC"),
            preferred_element_type=jnp.float32)
        return out.reshape(bt, gh * gw, e).astype(jnp.bfloat16)

    ref = np.asarray(a_shipped(x, kbf), np.float32)
    for name, fn, k in [("a_shipped", a_shipped, kbf),
                        ("b_cast_first", b_cast_first, kbf),
                        ("c_einsum", c_einsum, kbf),
                        ("d_conv", d_conv, kconv)]:
        got = np.asarray(fn(x, k), np.float32).reshape(ref.shape)
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        ms = time_fn(fn, x, k)
        print(f"{name:14s} {ms:7.3f} ms/iter  rel_err={err:.2e}")


if __name__ == "__main__":
    sys.exit(main())
