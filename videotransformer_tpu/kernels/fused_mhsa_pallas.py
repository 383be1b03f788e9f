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
  2. one Pallas kernel computing dq/dk/dv (p/ds live only in VMEM) AND the
     complete input gradient — d_xn = dqkv @ W_qkv^T, LayerNorm backward,
     residual passthrough — so the fp32 d_xn never touches HBM;
  3. the qkv WEIGHT grads as one large XLA einsum over (B*N) on the saved
     qkv (xn recomputed elementwise, fused into the einsum producer).

A whole-chain single-Pallas-kernel backward (proj + attention + LN/qkv in
one grid=(B,) kernel with VMEM-resident weight-grad accumulators) was
implemented and A/B-measured in round 3: 4 ms/step SLOWER on the batch-8
TimeSformer-B finetune step (108.8 vs 104.7 ms fwd+bwd) — the per-sequence
weight-gradient matmuls (contraction dim N=197, padded to 256) lose to
XLA's single large-einsum formulation over the whole (B·N) axis, and the
kernels the split path launches are already overlap-bound. The split form
is the winner and is what ships.

A second round-3 variant — a layout-native whole-LAYER kernel pair for the
divided spatial attention (grid=(B,), per-program (P, T, D) patch blocks
folded frame-major in VMEM, droppath/residual/cls handling fused, full
hand-written backward) — also lost its A/B: it removed ~12 ms/step of XLA
transpose/elementwise glue but its in-kernel attention ran ~12 ms/step
slower than this kernel (43.1 vs 30.5 ms of attention custom-calls in the
step trace; net +0.6 ms wall), the VMEM working set forced a 100MB budget,
and the padded frame-major rows cost Mosaic relayouts on every (P, t, D)
slice. Deleted; this split form remains the winner.
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


def _score_chunk(n, block):
    """Score-tile chunking for packed block-diagonal attention: the largest
    multiple of `block` that divides n, is <= 160 rows, and is >= 64 (one
    MXU tile of useful work); 0 when no such chunk exists (compute the full
    (n, n) tile). Tokens only attend within their own length-`block`
    diagonal block, so scores outside a chunk-aligned window are all masked:
    computing (chunk, chunk) tiles per chunk drops score FLOPs from O(n^2)
    to O(n*chunk). At the batch-8 TimeSformer-B step the full-tile
    formulation (N=448, block=8) spent 98% of its score FLOPs on masked
    entries — chunking recovers most of that."""
    best = 0
    c = block
    while c <= 160:
        if n % c == 0 and c < n:
            best = c
        c += block
    return best if best >= 64 else 0


def _neff(n, block_diag):
    """Effective score-matmul width: the chunk size when chunked, n when
    not (cost-model input)."""
    if not block_diag:
        return n
    return _score_chunk(n, block_diag) or n


def _vmem_params(N, D, itemsize, num_heads, with_qkv=False, bwd=False,
                 block_diag=0, Da=None, bwd_recompute=False):
    """Computed scoped-VMEM cap: stay at the 16MB default when everything
    fits (Mosaic pipelines best there — raising it at small N measured
    268 -> 248 clips/s), raise it only when the buffers genuinely need more
    (long sequences, fp32 inputs, saved-qkv outputs). ``Da`` is the attention
    width when it differs from the input width D (tensor-parallel shards)."""
    Da = D if Da is None else Da
    weights = (D * 3 * Da + Da * D) * itemsize
    acts = 2 * N * D * itemsize * 2 + N * 3 * Da * itemsize
    tile = (_score_chunk(N, block_diag) or N) if block_diag else N
    scores = 3 * tile * tile * 4  # per-head fp32 s/p (+dp/ds in backward)
    need = weights + acts + scores
    if with_qkv:
        need += N * 4 * D * itemsize
    if bwd:
        # dqkv + x/g rows, plus the in-kernel fp32 LN-backward temporaries
        # (xf/xhat/d_xn/dxhat)
        need += N * 3 * D * itemsize + 3 * tile * tile * 4
        need += 3 * N * D * itemsize + 4 * N * D * 4
    if bwd_recompute:
        # recomputed xn + qkv live in VMEM instead of a qkv input block
        need += N * 4 * D * itemsize
    need = int(need * 1.5)
    if need <= 16 * 1024 * 1024:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=min(need, 100 * 1024 * 1024))


def _kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            o_ref, *rest, num_heads, scale, ln_eps, add_residual,
            save_qkv=False, save_attn=False, block_diag=0):
    # NB a 2-sequences-per-program variant (unroll two independent sequences
    # so Mosaic interleaves one's VPU softmax under the other's matmuls) was
    # A/B'd on hardware and measured within relay noise in both directions
    # (benchmarks/mhsa_ab.py) — rejected as complexity without a win.
    x = x_ref[0]  # (N, D)
    N, D = x.shape
    # attention width from the qkv weight: D/tp under tensor parallelism
    # (sp.fused_sharded_call runs this kernel per model-shard), D otherwise
    Da = wqkv_ref.shape[1] // 3
    hd = Da // num_heads
    C = _score_chunk(N, block_diag) if block_diag else 0
    mask = _block_diag_mask(C or N, block_diag) if block_diag else None

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
    if save_qkv:
        rest[0][0] = qkv  # saved for the split backward pass

    def _sdpa(q, k, v):
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if mask is not None:
            s = jnp.where(mask, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        # deferred normalization (the flash-attention trick): divide by the
        # softmax sum AFTER the PV matmul, on the (rows, head_dim) output
        # instead of the (rows, N->256-lane-padded) probability tile —
        # the wide fp32 divide was pure VPU overhead
        o = jnp.dot(p.astype(x.dtype), v, preferred_element_type=jnp.float32)
        return (o / jnp.sum(p, axis=-1, keepdims=True)).astype(x.dtype)

    outs = []
    for h in range(num_heads):
        q = qkv[:, h * hd : (h + 1) * hd]
        k = qkv[:, Da + h * hd : Da + (h + 1) * hd]
        v = qkv[:, 2 * Da + h * hd : 2 * Da + (h + 1) * hd]
        if C:
            o = jnp.concatenate(
                [_sdpa(q[c:c + C], k[c:c + C], v[c:c + C])
                 for c in range(0, N, C)], axis=0)
        else:
            o = _sdpa(q, k, v)
        outs.append(o)
    attn_out = jnp.concatenate(outs, axis=-1)  # (N, Da)
    if save_attn:
        rest[1 if save_qkv else 0][0] = attn_out  # for the projection bwd

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
    Da = wqkv.shape[1] // 3
    hd = Da // num_heads
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
    o = o.transpose(0, 2, 1, 3).reshape(B, N, Da)
    out = (jnp.einsum("bnd,de->bne", o, wproj,
                      preferred_element_type=jnp.float32)
           + bproj.astype(jnp.float32))
    if add_residual:
        out = out + x.astype(jnp.float32)
    return out.astype(x.dtype)


def _fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
         num_heads, scale, ln_eps, add_residual, save_qkv=False,
         save_attn=False, block_diag=0):
    B, N, D = x.shape
    Da = wqkv.shape[1] // 3  # attention width (= D, or D/tp per model-shard)
    Do = wproj.shape[1]
    assert not add_residual or Do == D, (Do, D)
    grid = (B,)
    full = lambda *_: (0, 0)
    row = lambda n: pl.BlockSpec((1, N, n), lambda i: (i, 0, 0))

    out_shape = [jax.ShapeDtypeStruct((B, N, Do), x.dtype)]
    out_specs = [row(Do)]
    if save_qkv:
        out_shape.append(jax.ShapeDtypeStruct((B, N, 3 * Da), x.dtype))
        out_specs.append(row(3 * Da))
    if save_attn:
        out_shape.append(jax.ShapeDtypeStruct((B, N, Da), x.dtype))
        out_specs.append(row(Da))
    multi = len(out_shape) > 1
    return pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, scale=scale,
                          ln_eps=ln_eps, add_residual=add_residual,
                          save_qkv=save_qkv, save_attn=save_attn,
                          block_diag=block_diag),
        out_shape=tuple(out_shape) if multi else out_shape[0],
        grid=grid,
        in_specs=[
            row(D),
            pl.BlockSpec((D,), lambda i: (0,)),
            pl.BlockSpec((D,), lambda i: (0,)),
            pl.BlockSpec((D, 3 * Da), full),
            pl.BlockSpec((3 * Da,), lambda i: (0,)),
            pl.BlockSpec((Da, Do), full),
            pl.BlockSpec((Do,), lambda i: (0,)),
        ],
        out_specs=tuple(out_specs) if multi else out_specs[0],
        compiler_params=_vmem_params(N, D, x.dtype.itemsize, num_heads,
                                     with_qkv=save_qkv or save_attn,
                                     block_diag=block_diag, Da=Da),
        cost_estimate=pl.CostEstimate(
            flops=B * (2 * N * D * 3 * Da + 4 * N * _neff(N, block_diag) * Da
                       + 2 * N * Da * Do),
            bytes_accessed=(2 * B * N * D + D * 4 * Da) * x.dtype.itemsize,
            transcendentals=B * N * _neff(N, block_diag) * num_heads,
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


def _attn_bwd_kernel(*refs, num_heads, scale, ln_eps, add_residual,
                     block_diag=0, recompute_qkv=False):
    """Backward of LN -> qkv -> attention in one kernel, on the packed
    (N, 3D) layout of the qkv activations.

    Produces d(qkv) (written to HBM for the XLA weight-grad einsums), the
    COMPLETE input gradient dx (d_xn = dqkv @ W_qkv^T, LayerNorm backward,
    and the residual passthrough all happen in VMEM — the (N, D) fp32 d_xn
    never exists in HBM), and grid-accumulated dlns/dlnb partials. Folding
    the input-grad chain in removed the per-layer XLA LN-backward fusions
    and the fp32 d_xn round trip (~0.5 ms/layer on the batch-8 step); the
    weight grads stay in XLA where the single large einsum over (B*N) wins
    (see the whole-chain-backward A/B note in the module docstring).

    ``recompute_qkv``: flash-style rematerialization — the forward kernel
    does not save the (N, 3D) qkv to HBM at all; this kernel recomputes it
    from ``x`` (already an input for the LayerNorm backward) with one
    in-VMEM matmul, trading ~2·N·D·3D recompute FLOPs on an idle-anyway MXU
    for a (B, N, 3D) HBM store in forward plus the matching load here."""
    i = pl.program_id(0)
    if recompute_qkv:
        x_ref, do_ref = refs[:2]
        k = 2
    else:
        x_ref, qkv_ref, do_ref = refs[:3]
        k = 3
    if add_residual:
        g_ref = refs[k]
        k += 1
    else:
        g_ref = None
    if recompute_qkv:
        lns_ref, lnb_ref, wqkv_ref, bqkv_ref = refs[k:k + 4]
        k += 4
    else:
        lns_ref, wqkv_ref = refs[k:k + 2]
        k += 2
    dqkv_ref, dx_ref, dlns_ref, dlnb_ref, dbqkv_ref = refs[k:]

    do = do_ref[0]    # (N, D)
    # LayerNorm stats up front: shared by the qkv recompute (when on) and
    # the LayerNorm backward at the bottom
    xf = x_ref[0].astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + ln_eps)
    xhat = (xf - mean) * rstd

    if recompute_qkv:
        xn = (xhat * lns_ref[:].astype(jnp.float32)
              + lnb_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
        qkv = (
            jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
            + bqkv_ref[:].astype(jnp.float32)
        ).astype(x_ref.dtype)  # (N, 3D)
    else:
        qkv = qkv_ref[0]  # (N, 3D)
    N, D3 = qkv.shape
    D = D3 // 3
    hd = D // num_heads
    C = _score_chunk(N, block_diag) if block_diag else 0
    mask = _block_diag_mask(C or N, block_diag) if block_diag else None

    def _sdpa_bwd(q, k, v, do_h):
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if mask is not None:
            s = jnp.where(mask, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        # deferred normalization (see _sdpa): every 1/l is folded into a
        # (rows, head_dim) operand; the (rows, N->lane-padded) fp32 tiles see
        # one multiply (p_un * (dp - c)) instead of a divide + two multiplies
        p_un = jnp.exp(s - m)
        inv_l = 1.0 / jnp.sum(p_un, axis=-1, keepdims=True)
        dv = jax.lax.dot_general(  # p^T do = p_un^T (do / l)
            p_un.astype(qkv.dtype),
            (do_h.astype(jnp.float32) * inv_l).astype(qkv.dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(  # do v^T
            do_h, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        c = jnp.sum(dp * p_un, axis=-1, keepdims=True) * inv_l
        ds_un = (p_un * (dp - c)).astype(qkv.dtype)
        dq = jnp.dot(ds_un, k, preferred_element_type=jnp.float32) \
            * (scale * inv_l)
        dk = jax.lax.dot_general(  # ds^T q = ds_un^T (q * scale / l)
            ds_un,
            (q.astype(jnp.float32) * (scale * inv_l)).astype(qkv.dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return dq, dk, dv

    dqs, dks, dvs = [], [], []
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, D + h * hd:D + (h + 1) * hd]
        v = qkv[:, 2 * D + h * hd:2 * D + (h + 1) * hd]
        do_h = do[:, h * hd:(h + 1) * hd]
        if C:
            parts = [_sdpa_bwd(q[c:c + C], k[c:c + C], v[c:c + C],
                               do_h[c:c + C]) for c in range(0, N, C)]
            dq = jnp.concatenate([pt[0] for pt in parts], axis=0)
            dk = jnp.concatenate([pt[1] for pt in parts], axis=0)
            dv = jnp.concatenate([pt[2] for pt in parts], axis=0)
        else:
            dq, dk, dv = _sdpa_bwd(q, k, v, do_h)
        dqs.append(dq.astype(qkv.dtype))
        dks.append(dk.astype(qkv.dtype))
        dvs.append(dv.astype(qkv.dtype))
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)  # (N, 3D)
    dqkv_ref[0] = dqkv
    dbqkv_blk = dqkv.astype(jnp.float32).sum(axis=0, keepdims=True)

    # d_xn = dqkv @ W_qkv^T, then LayerNorm backward — all in VMEM
    # (LN stats xhat/rstd computed once at the top of the kernel)
    d_xn = jax.lax.dot_general(
        dqkv, wqkv_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (N, D) fp32
    dlns_blk = (d_xn * xhat).sum(axis=0, keepdims=True)
    dlnb_blk = d_xn.sum(axis=0, keepdims=True)
    dxhat = d_xn * lns_ref[:].astype(jnp.float32)
    dx = rstd * (dxhat
                 - dxhat.mean(axis=-1, keepdims=True)
                 - xhat * (dxhat * xhat).mean(axis=-1, keepdims=True))
    if g_ref is not None:  # residual passthrough (out = ... + x)
        dx = dx + g_ref[0].astype(jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _init():
        dlns_ref[:] = dlns_blk
        dlnb_ref[:] = dlnb_blk
        dbqkv_ref[:] = dbqkv_blk

    @pl.when(i > 0)
    def _acc():
        dlns_ref[:] += dlns_blk
        dlnb_ref[:] += dlnb_blk
        dbqkv_ref[:] += dbqkv_blk


def _attn_bwd(x, qkv, do, g, lns, lnb, wqkv, bqkv, num_heads, scale, ln_eps,
              add_residual, block_diag=0):
    """dqkv + complete dx (+ dlns/dlnb partials) in one kernel; `g` is the
    output gradient for the residual passthrough (None when the caller did
    not add the residual). ``qkv=None`` selects the flash-style recompute
    path (qkv rebuilt from x in VMEM; lnb/bqkv only used there)."""
    B, N = x.shape[:2]
    D3 = wqkv.shape[1]
    Da = D3 // 3           # attention width (local heads x head_dim)
    D = x.shape[-1]        # input/output width (full embed dim)
    recompute = qkv is None
    row = lambda n: pl.BlockSpec((1, N, n), lambda i: (i, 0, 0))
    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,))
    if recompute:
        operands = [x, do]
        in_specs = [row(D), row(Da)]
    else:
        operands = [x, qkv, do]
        in_specs = [row(D), row(D3), row(Da)]
    if add_residual:
        operands.append(g)
        in_specs.append(row(D))
    if recompute:
        operands += [lns, lnb, wqkv, bqkv]
        in_specs += [vec(D), vec(D),
                     pl.BlockSpec((D, D3), lambda i: (0, 0)), vec(D3)]
    else:
        operands += [lns, wqkv]
        in_specs += [vec(D), pl.BlockSpec((D, D3), lambda i: (0, 0))]
    act_dtype = x.dtype
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, num_heads=num_heads, scale=scale,
                          ln_eps=ln_eps, add_residual=add_residual,
                          block_diag=block_diag, recompute_qkv=recompute),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, D3), act_dtype),
            jax.ShapeDtypeStruct((B, N, D), x.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D3), jnp.float32),
        ),
        grid=(B,),
        in_specs=in_specs,
        out_specs=(
            row(D3),
            row(D),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D3), lambda i: (0, 0)),
        ),
        compiler_params=_vmem_params(N, D, act_dtype.itemsize,
                                     num_heads, bwd=True,
                                     block_diag=block_diag, Da=Da,
                                     bwd_recompute=recompute),
        cost_estimate=pl.CostEstimate(
            flops=B * N * (10 * _neff(N, block_diag) + 2 * D3) * D3 // 3
            + (B * 2 * N * D * D3 if recompute else 0),
            bytes_accessed=(4 if recompute else 5) * B * N * D3
            * act_dtype.itemsize,
            transcendentals=B * N * _neff(N, block_diag) * num_heads,
        ),
    )(*operands)


# Flash-style rematerialization switch: when True the forward kernel does
# NOT write the (B, N, 3D) qkv residual to HBM; the backward kernel
# recomputes it from x with one in-VMEM matmul. Hardware A/B at the train
# shape (64x197x768 bf16, benchmarks/mhsa_ab.py): the forward saves cost
# NOTHING (1.372 vs 1.374 ms — Mosaic overlaps the stores under the
# compute-bound kernel) while the recompute matmul costs +0.235 ms fwd+bwd
# (2.779 -> 3.014 ms; the MXU is not idle). So saving stays the THROUGHPUT
# default; flip this on only as a memory knob — it frees the (B, N, 3D)
# bf16 qkv residual (~58 MB/layer at batch 8) for ~8% slower attention
# backward, a cheaper trade than full `-remat` when only residual memory
# is tight. Both settings are gradient-tested (tests/test_fused_mhsa.py).
RECOMPUTE_QKV = False


def _vjp_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
             num_heads, scale, ln_eps, add_residual, block_diag):
    if RECOMPUTE_QKV:
        out, attn_out = _fwd(
            x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
            num_heads, scale, ln_eps, add_residual, save_attn=True,
            block_diag=block_diag)
        qkv = None
    else:
        out, qkv, attn_out = _fwd(
            x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
            num_heads, scale, ln_eps, add_residual, save_qkv=True,
            save_attn=True, block_diag=block_diag)
    return out, (x, qkv, attn_out, ln_scale, ln_bias, wqkv, bqkv, wproj)


def _vjp_bwd(num_heads, scale, ln_eps, add_residual, block_diag, res, g):
    """Split backward on the saved qkv / attn_out: projection grads are plain
    matmuls, d(qkv) runs through one Pallas kernel in the packed layout (no
    N×N matrix and no head relayouts in HBM), and the LN + qkv-matmul
    backward is hand-written (recomputes only the elementwise LN)."""
    x, qkv, attn_out, ln_scale, ln_bias, wqkv, bqkv, wproj = res
    gf = g.astype(jnp.float32)

    # projection backward (out = attn_out @ wproj + bproj [+ x])
    d_bproj = gf.sum((0, 1)).astype(wproj.dtype)
    d_wproj = jnp.einsum("bnd,bne->de", attn_out.astype(jnp.float32), gf
                         ).astype(wproj.dtype)
    do = jnp.einsum("bne,de->bnd", gf, wproj.astype(jnp.float32)
                    ).astype(x.dtype)

    d_qkv, d_x, d_lns, d_lnb, d_bqkv = _attn_bwd(
        x, qkv, do, g if add_residual else None, ln_scale, ln_bias, wqkv,
        bqkv, num_heads, scale, ln_eps, add_residual, block_diag=block_diag)
    d_lns = d_lns[0].astype(ln_scale.dtype)
    d_lnb = d_lnb[0].astype(ln_scale.dtype)
    d_bqkv = d_bqkv[0].astype(wqkv.dtype)

    # weight grads stay in XLA: one large einsum over (B*N) beats
    # per-program accumulation (module docstring A/B); xn is recomputed
    # elementwise and fused into the einsum producer
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + ln_eps)
          * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32))
    d_wqkv = jnp.einsum("bnd,bne->de", xn, d_qkv.astype(jnp.float32)
                        ).astype(wqkv.dtype)

    return d_x, d_lns, d_lnb, d_wqkv, d_bqkv, d_wproj, d_bproj


fused_prenorm_mhsa.defvjp(_vjp_fwd, _vjp_bwd)
