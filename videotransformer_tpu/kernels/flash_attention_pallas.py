"""Pallas TPU flash attention for video-transformer sequence shapes.

The video models run attention at modest sequence lengths (spatial: N=197,
joint space-time: N ≈ 8·196+1 = 1569, MViT: up to 1+8·56² pooled down), where
keys/values for one (batch, head) fit comfortably in VMEM. The kernel therefore
blocks only over queries and keeps full K/V per program ("full-K flash"):

  grid = (B·H, ceil(N / BQ))
  each program:  s = q_blk @ K^T * scale   (MXU, fp32 accum)
                 p = softmax(s)            (VPU, numerically-stable)
                 o = p @ V                 (MXU, fp32 accum)

No masking is needed: K/V blocks cover the exact N, and padded query rows in
the final block are dropped on the out-of-bounds write.

Backward: custom VJP that recomputes attention with XLA einsums (flash-style
recompute — O(N) memory for residuals instead of storing the N×N matrix).

Replaces the reference hot kernel /root/reference/transformer.py:165-177.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]  # (BQ, hd)
    k = k_ref[0]  # (N, hd)
    v = v_ref[0]  # (N, hd)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, N)
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _flash_fwd(q, k, v, scale):
    B, H, N, hd = q.shape
    qr = q.reshape(B * H, N, hd)
    kr = k.reshape(B * H, N, hd)
    vr = v.reshape(B * H, N, hd)

    BQ = min(512, _round_up(N, 128))
    grid = (B * H, pl.cdiv(N, BQ))

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, N, hd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BQ, hd), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, N, hd), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, N, hd), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BQ, hd), lambda i, j: (i, j, 0)),
        cost_estimate=pl.CostEstimate(
            flops=4 * N * N * hd * B * H,
            bytes_accessed=(3 * N * hd + N * hd) * B * H * q.dtype.itemsize,
            transcendentals=N * N * B * H,
        ),
    )(qr, kr, vr)
    return out.reshape(B, H, N, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale):
    """Fused softmax(q k^T * scale) v. q,k,v: (B, H, N, hd)."""
    return _flash_fwd(q, k, v, scale)


def _vjp_fwd(q, k, v, scale):
    return _flash_fwd(q, k, v, scale), (q, k, v)


def _vjp_bwd(scale, res, g):
    q, k, v = res
    # Recompute attention (flash-style): fp32 softmax, then standard gradients.
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    gf = g.astype(jnp.float32)
    dv = jnp.einsum("bhnm,bhnd->bhmd", p, gf).astype(v.dtype)
    dp = jnp.einsum("bhnd,bhmd->bhnm", gf, v.astype(jnp.float32))
    # softmax backward: ds = p * (dp - sum(dp * p))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = ds * scale
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds, k.astype(jnp.float32)).astype(q.dtype)
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds, q.astype(jnp.float32)).astype(k.dtype)
    return dq, dk, dv


flash_attention.defvjp(_vjp_fwd, _vjp_bwd)
