"""Pallas TPU flash attention for video-transformer sequence shapes.

The video models run attention at modest sequence lengths (spatial: N=197,
joint space-time: N ≈ 8·196+1 = 1569, MViT: up to 1+8·56² queries against
pooled keys/values), where keys/values for one (batch, head) fit comfortably
in VMEM. The kernels therefore block only over queries and keep full K/V per
program ("full-K flash"):

  forward  grid = (B·H, ceil(Nq / BQ))
    s = q_blk @ K^T * scale   (MXU, fp32 accum)
    p = softmax(s)            (VPU, numerically-stable)
    o = p @ V                 (MXU, fp32 accum)

  backward grid = (B·H, ceil(Nq / BQ))   — same recompute, never
    materializing the (Nq, Nkv) matrix in HBM:
    p   = softmax(q_blk K^T * scale)
    dv += p^T do_blk                      (accumulated across q blocks)
    dp  = do_blk V^T
    ds  = p ⊙ (dp - rowsum(dp ⊙ p)) * scale
    dq  = ds K
    dk += ds^T q_blk                      (accumulated across q blocks)

  dk/dv accumulate in fp32 output blocks that stay VMEM-resident across the
  sequential q-block grid steps (their index_map ignores the q index).

Query/gradient rows past Nq in the final block are zero-masked on load, so
padded rows contribute exactly 0 to dk/dv and their dq rows are dropped on
the out-of-bounds write. Nq and Nkv may differ (MViT pooled K/V).

Replaces the reference hot kernel /root/reference/transformer.py:165-177 and
the pytorchvideo pooled attention (/root/reference/video_transformer.py:754-786).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _q_mask(j, bq, nq):
    """(BQ, 1) bool mask: True for real query rows, False for block padding."""
    row = jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0) + j * bq
    return row < nq


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]  # (BQ, hd)
    k = k_ref[0]  # (Nkv, hd)
    v = v_ref[0]  # (Nkv, hd)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, Nkv)
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _flash_fwd(q, k, v, scale):
    B, H, Nq, hd = q.shape
    Nkv = k.shape[2]
    qr = q.reshape(B * H, Nq, hd)
    kr = k.reshape(B * H, Nkv, hd)
    vr = v.reshape(B * H, Nkv, hd)

    BQ = min(512, _round_up(Nq, 128))
    grid = (B * H, pl.cdiv(Nq, BQ))

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, Nq, hd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BQ, hd), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, Nkv, hd), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, Nkv, hd), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BQ, hd), lambda i, j: (i, j, 0)),
        cost_estimate=pl.CostEstimate(
            flops=4 * Nq * Nkv * hd * B * H,
            bytes_accessed=(2 * Nq * hd + 2 * Nkv * hd) * B * H * q.dtype.itemsize,
            transcendentals=Nq * Nkv * B * H,
        ),
    )(qr, kr, vr)
    return out.reshape(B, H, Nq, hd)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale, nq):
    j = pl.program_id(1)
    bq = q_ref.shape[1]
    mask = _q_mask(j, bq, nq)  # (BQ, 1)

    # where (not multiply): block padding may read back as NaN
    q = jnp.where(mask, q_ref[0].astype(jnp.float32), 0.0)  # (BQ, hd)
    do = jnp.where(mask, do_ref[0].astype(jnp.float32), 0.0)  # (BQ, hd)
    k = k_ref[0]  # (Nkv, hd)
    v = v_ref[0]
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    s = jax.lax.dot_general(
        q, kf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, Nkv)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    # dv += p^T do   (contract the BQ axis; masked rows contribute 0)
    dv_blk = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    # dp = do v^T
    dp = jax.lax.dot_general(
        do, vf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    # dq = ds k
    dq = jnp.dot(ds, kf, preferred_element_type=jnp.float32)
    # dk += ds^T q
    dk_blk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(j == 0)
    def _init():
        dk_ref[0] = dk_blk
        dv_ref[0] = dv_blk

    @pl.when(j > 0)
    def _acc():
        dk_ref[0] += dk_blk
        dv_ref[0] += dv_blk


def _flash_bwd(q, k, v, do, scale):
    """dq, dk, dv for o = softmax(q k^T * scale) v; all (B, H, N*, hd)."""
    B, H, Nq, hd = q.shape
    Nkv = k.shape[2]
    qr = q.reshape(B * H, Nq, hd)
    kr = k.reshape(B * H, Nkv, hd)
    vr = v.reshape(B * H, Nkv, hd)
    dor = do.reshape(B * H, Nq, hd)

    BQ = min(512, _round_up(Nq, 128))
    grid = (B * H, pl.cdiv(Nq, BQ))

    kv_spec = pl.BlockSpec((1, Nkv, hd), lambda i, j: (i, 0, 0))
    q_spec = pl.BlockSpec((1, BQ, hd), lambda i, j: (i, j, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, nq=Nq),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Nq, hd), q.dtype),
            jax.ShapeDtypeStruct((B * H, Nkv, hd), jnp.float32),
            jax.ShapeDtypeStruct((B * H, Nkv, hd), jnp.float32),
        ),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, q_spec],
        out_specs=(q_spec, kv_spec, kv_spec),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if max(Nq, Nkv) > 512 else None),
        cost_estimate=pl.CostEstimate(
            flops=10 * Nq * Nkv * hd * B * H,
            bytes_accessed=(4 * Nq * hd + 6 * Nkv * hd) * B * H
            * q.dtype.itemsize,
            transcendentals=Nq * Nkv * B * H,
        ),
    )(qr, kr, vr, dor)
    return (
        dq.reshape(B, H, Nq, hd),
        dk.reshape(B, H, Nkv, hd).astype(k.dtype),
        dv.reshape(B, H, Nkv, hd).astype(v.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale):
    """Fused softmax(q k^T * scale) v. q: (B, H, Nq, hd); k, v: (B, H, Nkv, hd)."""
    return _flash_fwd(q, k, v, scale)


def _vjp_fwd(q, k, v, scale):
    return _flash_fwd(q, k, v, scale), (q, k, v)


def _vjp_bwd(scale, res, g):
    q, k, v = res
    return _flash_bwd(q, k, v, g, scale)


flash_attention.defvjp(_vjp_fwd, _vjp_bwd)
