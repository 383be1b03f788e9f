"""Fused prenorm multi-head self-attention Pallas kernel.

One kernel computes, per sequence in the batch:

    xn  = LayerNorm(x) * scale + bias            (VPU, fp32 stats)
    qkv = xn @ W_qkv + b_qkv                     (MXU)
    per head: o_h = softmax(q_h k_h^T * s) v_h   (MXU + VPU, fp32 softmax)
    out = concat(o_h) @ W_proj + b_proj + x      (MXU, residual add)

This is the TPU replacement for the reference's hot path
LayerNorm -> Attention(qkv/softmax/proj) -> residual
(transformer.py:153-177 + the prenorm wrappers): instead of five HBM round
trips for x/qkv/probs/attn-out/proj-out, activations stay in VMEM for the
whole block; the projection weights are grid-invariant so Mosaic keeps them
resident across programs.

Used by the divided SPATIAL attention (N = 197) and joint attention; the tiny
temporal attention stays on the VPU broadcast path (ops/blocks._sdpa_small_n).

Backward: split custom VJP with O(N·D) residuals. The forward kernel saves
``qkv`` and the pre-projection ``attn_out`` alongside the output; backward is
then three cheap pieces, none of which materializes an (N, N) matrix in HBM:

  1. projection grads as plain XLA matmuls on the saved ``attn_out``;
  2. dq/dk/dv through the Pallas flash-attention backward kernel
     (flash_attention_pallas._flash_bwd — p/ds live only in VMEM);
  3. hand-written LN + qkv-matmul backward (recomputes only the elementwise
     LN statistics).

A whole-chain single-Pallas-kernel backward (proj + attention + LN/qkv in
one grid=(B,) kernel with VMEM-resident weight-grad accumulators) was
implemented and A/B-measured in round 3: 4 ms/step SLOWER on the batch-8
TimeSformer-B finetune step (108.8 vs 104.7 ms fwd+bwd) — the per-sequence
weight-gradient matmuls (contraction dim N=197, padded to 256) lose to
XLA's single large-einsum formulation over the whole (B·N) axis, and the
kernels the split path launches are already overlap-bound. The split form
is the winner and is what ships.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_diag_mask(n, block):
    """(n, n) bool: True where row and col fall in the same length-`block`
    diagonal block. Packing many short sequences into one kernel row-block
    and masking turns tiny-T attention (divided TEMPORAL attention, T=8)
    into full MXU tiles instead of a VPU broadcast storm."""
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // block
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // block
    return row == col


def _vmem_params(N, D, itemsize, num_heads, with_qkv=False, bwd=False):
    """Computed scoped-VMEM cap: stay at the 16MB default when everything
    fits (Mosaic pipelines best there — raising it at small N measured
    268 -> 248 clips/s), raise it only when the buffers genuinely need more
    (long sequences, fp32 inputs, saved-qkv outputs)."""
    weights = (D * 3 * D + D * D) * itemsize
    acts = 2 * N * D * itemsize * 2 + N * 3 * D * itemsize
    scores = 3 * N * N * 4  # per-head fp32 s/p (+dp/ds in backward)
    need = weights + acts + scores
    if with_qkv:
        need += N * 4 * D * itemsize
    if bwd:
        need += N * 3 * D * itemsize + N * N * 4
    need = int(need * 1.5)
    if need <= 16 * 1024 * 1024:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=min(need, 100 * 1024 * 1024))


def _kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            o_ref, *rest, num_heads, scale, ln_eps, add_residual,
            with_qkv=False, block_diag=0):
    x = x_ref[0]  # (N, D)
    N, D = x.shape
    hd = D // num_heads
    mask = _block_diag_mask(N, block_diag) if block_diag else None

    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    xn = xn * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    xn = xn.astype(x.dtype)

    qkv = (
        jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[:].astype(jnp.float32)
    ).astype(x.dtype)  # (N, 3D)
    if with_qkv:
        rest[0][0] = qkv  # saved for the split backward pass

    outs = []
    for h in range(num_heads):
        q = qkv[:, h * hd : (h + 1) * hd]
        k = qkv[:, D + h * hd : D + (h + 1) * hd]
        v = qkv[:, 2 * D + h * hd : 2 * D + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (N, N)
        if mask is not None:
            s = jnp.where(mask, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(x.dtype), v, preferred_element_type=jnp.float32)
        outs.append(o.astype(x.dtype))
    attn_out = jnp.concatenate(outs, axis=-1)  # (N, D)
    if with_qkv:
        rest[1][0] = attn_out  # saved for the projection backward

    out = (
        jnp.dot(attn_out, wproj_ref[:], preferred_element_type=jnp.float32)
        + bproj_ref[:].astype(jnp.float32)
    )
    if add_residual:
        out = out + x.astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _reference_jnp(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                   num_heads, scale, ln_eps, add_residual=True,
                   block_diag=0):
    """Pure-jnp reference (also the backward recompute path)."""
    B, N, D = x.shape
    hd = D // num_heads
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + ln_eps)
          * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)).astype(x.dtype)
    qkv = (jnp.einsum("bnd,de->bne", xn, wqkv,
                      preferred_element_type=jnp.float32)
           + bqkv.astype(jnp.float32)).astype(x.dtype)
    qkv = qkv.reshape(B, N, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    if block_diag:
        s = jnp.where(_block_diag_mask(N, block_diag), s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(x.dtype), v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(B, N, D)
    out = (jnp.einsum("bnd,de->bne", o, wproj,
                      preferred_element_type=jnp.float32)
           + bproj.astype(jnp.float32))
    if add_residual:
        out = out + x.astype(jnp.float32)
    return out.astype(x.dtype)


def _fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
         num_heads, scale, ln_eps, add_residual, with_qkv=False,
         block_diag=0):
    B, N, D = x.shape
    grid = (B,)
    full = lambda *_: (0, 0)

    out_shape = jax.ShapeDtypeStruct((B, N, D), x.dtype)
    if with_qkv:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((B, N, 3 * D), x.dtype),
                     jax.ShapeDtypeStruct((B, N, D), x.dtype))
    return pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, scale=scale,
                          ln_eps=ln_eps, add_residual=add_residual,
                          with_qkv=with_qkv, block_diag=block_diag),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((D,), lambda i: (0,)),
            pl.BlockSpec((D,), lambda i: (0,)),
            pl.BlockSpec((D, 3 * D), full),
            pl.BlockSpec((3 * D,), lambda i: (0,)),
            pl.BlockSpec((D, D), full),
            pl.BlockSpec((D,), lambda i: (0,)),
        ],
        out_specs=(
            (pl.BlockSpec((1, N, D), lambda i: (i, 0, 0)),
             pl.BlockSpec((1, N, 3 * D), lambda i: (i, 0, 0)),
             pl.BlockSpec((1, N, D), lambda i: (i, 0, 0)))
            if with_qkv else pl.BlockSpec((1, N, D), lambda i: (i, 0, 0))),
        compiler_params=_vmem_params(N, D, x.dtype.itemsize, num_heads,
                                     with_qkv=with_qkv),
        cost_estimate=pl.CostEstimate(
            flops=B * (2 * N * D * 3 * D + 4 * N * N * D + 2 * N * D * D),
            bytes_accessed=(2 * B * N * D + D * 4 * D) * x.dtype.itemsize,
            transcendentals=B * N * N * num_heads,
        ),
    )(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def fused_prenorm_mhsa(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                       num_heads, scale, ln_eps=1e-5, add_residual=True,
                       block_diag=0):
    """x (B, N, D) -> LayerNorm -> MHSA -> proj [-> +x]. Weights flax layout
    (in, out). block_diag=T masks attention into independent length-T
    diagonal blocks (packed tiny-sequence attention — divided temporal)."""
    return _fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                num_heads, scale, ln_eps, add_residual, block_diag=block_diag)


def _attn_bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, num_heads, scale,
                     block_diag=0):
    """d(qkv) of multi-head attention, directly in the packed (N, 3D) layout
    of the saved qkv — no head-split/merge relayouts in HBM."""
    qkv = qkv_ref[0]  # (N, 3D)
    do = do_ref[0]    # (N, D)
    N, D3 = qkv.shape
    D = D3 // 3
    hd = D // num_heads
    mask = _block_diag_mask(N, block_diag) if block_diag else None
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, D + h * hd:D + (h + 1) * hd]
        v = qkv[:, 2 * D + h * hd:2 * D + (h + 1) * hd]
        do_h = do[:, h * hd:(h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (N, N)
        if mask is not None:
            s = jnp.where(mask, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        p_c = p.astype(qkv.dtype)
        dv = jax.lax.dot_general(  # p^T do
            p_c, do_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(  # do v^T
            do_h, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
              ).astype(qkv.dtype)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(  # ds^T q
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dqkv_ref[0, :, h * hd:(h + 1) * hd] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, D + h * hd:D + (h + 1) * hd] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * D + h * hd:2 * D + (h + 1) * hd] = (
            dv.astype(dqkv_ref.dtype))


def _attn_bwd(qkv, do, num_heads, scale, block_diag=0):
    B, N, D3 = qkv.shape
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, num_heads=num_heads, scale=scale,
                          block_diag=block_diag),
        out_shape=jax.ShapeDtypeStruct((B, N, D3), qkv.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, D3), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, N, D3 // 3), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, N, D3), lambda i: (i, 0, 0)),
        compiler_params=_vmem_params(N, D3 // 3, qkv.dtype.itemsize,
                                     num_heads, bwd=True),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * N * N * D3 // 3,
            bytes_accessed=3 * B * N * D3 * qkv.dtype.itemsize,
            transcendentals=B * N * N * num_heads,
        ),
    )(qkv, do)


def _vjp_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
             num_heads, scale, ln_eps, add_residual, block_diag):
    out, qkv, attn_out = _fwd(
        x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
        num_heads, scale, ln_eps, add_residual, with_qkv=True,
        block_diag=block_diag)
    return out, (x, qkv, attn_out, ln_scale, ln_bias, wqkv, wproj)


def _vjp_bwd(num_heads, scale, ln_eps, add_residual, block_diag, res, g):
    """Split backward on the saved qkv / attn_out: projection grads are plain
    matmuls, d(qkv) runs through one Pallas kernel in the packed layout (no
    N×N matrix and no head relayouts in HBM), and the LN + qkv-matmul
    backward is hand-written (recomputes only the elementwise LN)."""
    x, qkv, attn_out, ln_scale, ln_bias, wqkv, wproj = res
    gf = g.astype(jnp.float32)

    # projection backward (out = attn_out @ wproj + bproj [+ x])
    d_bproj = gf.sum((0, 1)).astype(wproj.dtype)
    d_wproj = jnp.einsum("bnd,bne->de", attn_out.astype(jnp.float32), gf
                         ).astype(wproj.dtype)
    do = jnp.einsum("bne,de->bnd", gf, wproj.astype(jnp.float32)
                    ).astype(x.dtype)
    d_x_res = g if add_residual else None

    d_qkv = _attn_bwd(qkv, do, num_heads, scale, block_diag=block_diag)

    # recompute LN only (cheap, elementwise)
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + ln_eps)
    xhat = (xf - mean) * rstd
    xn = (xhat * ln_scale.astype(jnp.float32)
          + ln_bias.astype(jnp.float32)).astype(x.dtype)

    # qkv projection backward (flax Dense semantics: y = xn @ W + b)
    d_qkv_f = d_qkv.astype(jnp.float32)
    B, N, D = x.shape
    d_wqkv = jnp.einsum("bnd,bne->de", xn.astype(jnp.float32), d_qkv_f
                        ).astype(wqkv.dtype)
    d_bqkv = d_qkv_f.sum((0, 1)).astype(wqkv.dtype)
    d_xn = jnp.einsum("bne,de->bnd", d_qkv_f, wqkv.astype(jnp.float32))

    # LayerNorm backward
    d_lns = (d_xn * xhat).sum((0, 1)).astype(ln_scale.dtype)
    d_lnb = d_xn.sum((0, 1)).astype(ln_scale.dtype)
    d_xhat = d_xn * ln_scale.astype(jnp.float32)
    d_x = rstd * (d_xhat
                  - d_xhat.mean(-1, keepdims=True)
                  - xhat * (d_xhat * xhat).mean(-1, keepdims=True))
    if d_x_res is not None:
        d_x = d_x + d_x_res.astype(jnp.float32)
    d_x = d_x.astype(x.dtype)

    return d_x, d_lns, d_lnb, d_wqkv, d_bqkv, d_wproj, d_bproj


fused_prenorm_mhsa.defvjp(_vjp_fwd, _vjp_bwd)
