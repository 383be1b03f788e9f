"""Fused divided-TEMPORAL attention Pallas kernel.

The temporal half of divided space-time attention runs at sequence length
T = num_frames (8/16) with batch b*p (thousands of rows). Batched (T x T)
matmuls waste the MXU, and the unfused module pays five HBM round trips
(LN / qkv / attention / proj / temporal_fc). This kernel processes G sequences
per program:

    (G, T, D) -> LN -> qkv (one big MXU matmul over G*T rows)
    per head: scores/softmax/weighted-sum as VPU broadcast-reduce
              (no MXU tile padding at T=8)
    -> out-projection -> temporal_fc (zero-init, transformer.py:228-232)

Residual add and cls-token plumbing stay outside (transformer.py:269-282).
Backward: custom VJP through a pure-jnp twin.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            wtfc_ref, btfc_ref, o_ref, *, num_heads, scale, ln_eps, has_tfc):
    x = x_ref[:]  # (G, T, D)
    G, T, D = x.shape
    hd = D // num_heads

    xf = x.reshape(G * T, D).astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    xn = (xn * lns_ref[:].astype(jnp.float32)
          + lnb_ref[:].astype(jnp.float32)).astype(x.dtype)

    qkv = (jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
           + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)  # (G*T, 3D)

    outs = []
    for h in range(num_heads):
        q = qkv[:, h * hd : (h + 1) * hd].reshape(G, T, hd).astype(jnp.float32)
        k = qkv[:, D + h * hd : D + (h + 1) * hd].reshape(G, T, hd).astype(jnp.float32)
        v = qkv[:, 2 * D + h * hd : 2 * D + (h + 1) * hd].reshape(G, T, hd).astype(jnp.float32)
        # VPU broadcast-reduce attention (T tiny)
        s = (q[:, :, None, :] * k[:, None, :, :]).sum(-1) * scale  # (G, T, T)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = (p[..., None] * v[:, None, :, :]).sum(2)  # (G, T, hd)
        outs.append(o)
    attn = jnp.concatenate(outs, axis=-1).reshape(G * T, D).astype(x.dtype)

    out = (jnp.dot(attn, wproj_ref[:], preferred_element_type=jnp.float32)
           + bproj_ref[:].astype(jnp.float32))
    if has_tfc:
        out = (jnp.dot(out.astype(x.dtype), wtfc_ref[:],
                       preferred_element_type=jnp.float32)
               + btfc_ref[:].astype(jnp.float32))
    o_ref[:] = out.reshape(G, T, D).astype(o_ref.dtype)


def _reference_jnp(x, lns, lnb, wqkv, bqkv, wproj, bproj, wtfc, btfc,
                   num_heads, scale, ln_eps, has_tfc):
    B, T, D = x.shape
    hd = D // num_heads
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + ln_eps)
          * lns.astype(jnp.float32) + lnb.astype(jnp.float32)).astype(x.dtype)
    qkv = (jnp.einsum("btd,de->bte", xn, wqkv,
                      preferred_element_type=jnp.float32)
           + bqkv.astype(jnp.float32))
    qkv = qkv.reshape(B, T, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    s = (q[..., :, None, :] * k[..., None, :, :]).sum(-1) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = (p[..., None] * v[..., None, :, :]).sum(-2)
    o = o.transpose(0, 2, 1, 3).reshape(B, T, D).astype(x.dtype)
    out = (jnp.einsum("btd,de->bte", o, wproj,
                      preferred_element_type=jnp.float32)
           + bproj.astype(jnp.float32))
    if has_tfc:
        out = (jnp.einsum("btd,de->bte", out.astype(x.dtype), wtfc,
                          preferred_element_type=jnp.float32)
               + btfc.astype(jnp.float32))
    return out.astype(x.dtype)


def _fwd(x, lns, lnb, wqkv, bqkv, wproj, bproj, wtfc, btfc,
         num_heads, scale, ln_eps, has_tfc):
    B, T, D = x.shape
    G = 64  # VMEM budget: qkv (G*T, 3D) + per-head broadcasts + weights
    grid = (pl.cdiv(B, G),)
    return pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, scale=scale,
                          ln_eps=ln_eps, has_tfc=has_tfc),
        out_shape=jax.ShapeDtypeStruct((B, T, D), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, T, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((D,), lambda i: (0,)),
            pl.BlockSpec((D,), lambda i: (0,)),
            pl.BlockSpec((D, 3 * D), lambda i: (0, 0)),
            pl.BlockSpec((3 * D,), lambda i: (0,)),
            pl.BlockSpec((D, D), lambda i: (0, 0)),
            pl.BlockSpec((D,), lambda i: (0,)),
            pl.BlockSpec((D, D), lambda i: (0, 0)),
            pl.BlockSpec((D,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((G, T, D), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=B * T * (2 * D * 3 * D + 4 * T * D + 2 * D * D * (2 if has_tfc else 1)),
            bytes_accessed=2 * B * T * D * x.dtype.itemsize,
            transcendentals=B * T * T * num_heads,
        ),
    )(x, lns, lnb, wqkv, bqkv, wproj, bproj, wtfc, btfc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def fused_temporal_attention(x, lns, lnb, wqkv, bqkv, wproj, bproj, wtfc, btfc,
                             num_heads, scale, ln_eps=1e-5, has_tfc=True):
    """x (B, T, D) -> LN -> MHSA(T) -> proj [-> temporal_fc] (no residual)."""
    return _fwd(x, lns, lnb, wqkv, bqkv, wproj, bproj, wtfc, btfc,
                num_heads, scale, ln_eps, has_tfc)


def _vjp_fwd(x, lns, lnb, wqkv, bqkv, wproj, bproj, wtfc, btfc,
             num_heads, scale, ln_eps, has_tfc):
    out = _fwd(x, lns, lnb, wqkv, bqkv, wproj, bproj, wtfc, btfc,
               num_heads, scale, ln_eps, has_tfc)
    return out, (x, lns, lnb, wqkv, bqkv, wproj, bproj, wtfc, btfc)


def _vjp_bwd(num_heads, scale, ln_eps, has_tfc, res, g):
    _, vjp = jax.vjp(
        lambda *a: _reference_jnp(*a, num_heads=num_heads, scale=scale,
                                  ln_eps=ln_eps, has_tfc=has_tfc),
        *res)
    return vjp(g)


fused_temporal_attention.defvjp(_vjp_fwd, _vjp_bwd)
