"""Fused prenorm FFN Pallas kernel: LayerNorm -> fc1 -> GELU -> fc2.

Replaces the reference FFNWithPreNorm hot path (transformer.py:516-523) on
TPU. The (N, 4D) hidden activation never touches HBM — it lives in VMEM for
the GELU and the second matmul; fc1/fc2 weights are grid-invariant. The
residual add stays outside (DropPath applies to the branch first).

Block over rows: each program handles a (ROWS, D) slice of the flattened
(B*N, D) token matrix, so one kernel serves every sequence length.

Backward: custom VJP through a pure-jnp twin.
"""

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """fp32 erf via Abramowitz-Stegun 7.1.26 (max abs error 1.5e-7 ~ fp32 eps).
    Mosaic has no erf/erfc lowering; exp is supported."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
            *, ln_eps):
    x = x_ref[:]  # (ROWS, D)
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    xn = (xn * lns_ref[:].astype(jnp.float32)
          + lnb_ref[:].astype(jnp.float32)).astype(x.dtype)

    h = (jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
         + b1_ref[:].astype(jnp.float32))
    # exact erf-GELU via the in-kernel erf approximation
    h = (0.5 * h * (1.0 + _erf(h * np.float32(1 / np.sqrt(2))))).astype(x.dtype)
    out = (jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
           + b2_ref[:].astype(jnp.float32))
    o_ref[:] = out.astype(o_ref.dtype)


def _reference_jnp(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + ln_eps)
          * ln_scale.astype(jnp.float32)
          + ln_bias.astype(jnp.float32)).astype(x.dtype)
    h = (jnp.einsum("nd,de->ne", xn, w1, preferred_element_type=jnp.float32)
         + b1.astype(jnp.float32))
    h = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    out = (jnp.einsum("ne,ef->nf", h, w2, preferred_element_type=jnp.float32)
           + b2.astype(jnp.float32))
    return out.astype(x.dtype)


def _fwd(x2d, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps):
    M, D = x2d.shape
    hidden = w1.shape[1]
    d_out = w2.shape[1]  # may differ from D (MViT dim-expanding MLP)
    ROWS = 256
    grid = (pl.cdiv(M, ROWS),)
    return pl.pallas_call(
        functools.partial(_kernel, ln_eps=ln_eps),
        out_shape=jax.ShapeDtypeStruct((M, d_out), x2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, D), lambda i: (i, 0)),
            pl.BlockSpec((D,), lambda i: (0,)),
            pl.BlockSpec((D,), lambda i: (0,)),
            pl.BlockSpec((D, hidden), lambda i: (0, 0)),
            pl.BlockSpec((hidden,), lambda i: (0,)),
            pl.BlockSpec((hidden, d_out), lambda i: (0, 0)),
            pl.BlockSpec((d_out,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((ROWS, d_out), lambda i: (i, 0)),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * hidden * (D + d_out),
            bytes_accessed=(M * (D + d_out) + (D + d_out) * hidden) * x2d.dtype.itemsize,
            transcendentals=M * hidden,
        ),
    )(x2d, ln_scale, ln_bias, w1, b1, w2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_prenorm_ffn(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps=1e-5):
    """x (..., D) -> LN -> fc1 -> erf-GELU -> fc2 (no residual).
    fc2 may change the feature dim (MViT dim-expanding MLP)."""
    shape = x.shape
    out = _fwd(x.reshape(-1, shape[-1]), ln_scale, ln_bias, w1, b1, w2, b2,
               ln_eps)
    return out.reshape(shape[:-1] + (w2.shape[1],))


def _vjp_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps):
    return (fused_prenorm_ffn(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps),
            (x, ln_scale, ln_bias, w1, b1, w2, b2))


def _vjp_bwd(ln_eps, res, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res
    shape = x.shape

    def f(x2d, lns, lnb, w1_, b1_, w2_, b2_):
        return _reference_jnp(x2d, lns, lnb, w1_, b1_, w2_, b2_, ln_eps)

    _, vjp = jax.vjp(f, x.reshape(-1, shape[-1]), ln_scale, ln_bias,
                     w1, b1, w2, b2)
    gx, glns, glnb, gw1, gb1, gw2, gb2 = vjp(g.reshape(-1, shape[-1]))
    return gx.reshape(shape), glns, glnb, gw1, gb1, gw2, gb2


fused_prenorm_ffn.defvjp(_vjp_fwd, _vjp_bwd)
