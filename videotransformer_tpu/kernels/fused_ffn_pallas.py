"""Fused prenorm FFN Pallas kernel: LayerNorm -> fc1 -> GELU -> fc2.

Replaces the reference FFNWithPreNorm hot path (transformer.py:516-523) on
TPU. The (N, 4D) hidden activation never touches HBM — it lives in VMEM for
the GELU and the second matmul; fc1/fc2 weights are grid-invariant. The
residual add stays outside (DropPath applies to the branch first).

Block over rows: each program handles a (ROWS, D) slice of the flattened
(B*N, D) token matrix, so one kernel serves every sequence length.

Backward: a second Pallas kernel with the same row blocking. The forward
saves the pre-GELU hidden (h_pre), so backward recomputes only the
elementwise pieces (LN stats, GELU) and runs exactly the four gradient
matmuls — emitting its dx rows and accumulating the weight/bias/LN
gradients into fp32 output blocks that stay VMEM-resident across the
sequential row grid (their index_map ignores the row index). Padded rows in
the final block are zero-masked on load so they contribute exactly 0 to
every accumulator.
"""

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row-block sizes (module-level so the fault-bisect harness can sweep them;
# see benchmarks/bisect_maskfeat.py).
#
# BWD_ROWS is 512 deliberately: with 256-row backward blocks, a program
# containing two or more [XLA attention + fused-FFN(D=768, hidden=3072)]
# pairs at M ≈ 12.5k rows reproducibly faults this environment's TPU worker
# (round-2 "MaskFeat batch-8" crash). The same kernel at the same shapes
# passes standalone and in every smaller composition, numerics are verified
# in interpret mode, and the fault follows the 256-row parametrization (512
# passes at both 25- and 50-step grids) — i.e. a Mosaic/XLA codegen defect
# triggered by the composition, not kernel logic. 512-row blocks also halve
# the weight-gradient accumulation rounds. Regression coverage:
# benchmarks/bisect_maskfeat.py (mini768 / model-ffn / step-full) and the
# batch-8 sweep in benchmarks/run_all.py.
#
# An h_pre-RECOMPUTE backward variant (no (M, 4D) residual in HBM) was
# implemented and A/B-measured in round 3: 5 ms/step SLOWER on the batch-8
# TimeSformer-B finetune step (103.3 vs 98.3 ms fwd+bwd) — the kernels are
# compute-bound and Mosaic hides the residual's HBM round-trip behind the
# MXU, so the extra recompute matmul is pure cost. The saved-h_pre form is
# the winner and is what ships.
FWD_ROWS = 256
BWD_ROWS = 512


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
            *rest, ln_eps, with_hpre=False):
    x = x_ref[:]  # (ROWS, D)
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    xn = (xn * lns_ref[:].astype(jnp.float32)
          + lnb_ref[:].astype(jnp.float32)).astype(x.dtype)

    h = (jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
         + b1_ref[:].astype(jnp.float32))
    if with_hpre:
        rest[0][:] = h.astype(x.dtype)  # saved pre-GELU hidden for backward
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


def _vmem_params(rows, D, hidden, d_out, itemsize, bwd=False):
    """Raise the scoped-VMEM cap only when the kernel genuinely needs more
    than the 16MB default (fp32 weights / backward accumulators); staying at
    the default preserves Mosaic's pipelining headroom for the bf16 case."""
    weights = (D * hidden + hidden * d_out) * itemsize
    acts = 2 * rows * (D + d_out) * itemsize + 3 * rows * hidden * 4
    need = weights + acts
    if bwd:
        need += (D * hidden + hidden * d_out) * 4  # fp32 grad accumulators
        need += 2 * rows * hidden * 4 + rows * D * 4
    need = int(need * 1.4)  # headroom for Mosaic temporaries
    if need <= 16 * 1024 * 1024:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=min(need, 100 * 1024 * 1024))


def _fwd(x2d, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps, with_hpre=False):
    M, D = x2d.shape
    hidden = w1.shape[1]
    d_out = w2.shape[1]  # may differ from D (MViT dim-expanding MLP)
    ROWS = FWD_ROWS
    grid = (pl.cdiv(M, ROWS),)
    out_shape = jax.ShapeDtypeStruct((M, d_out), x2d.dtype)
    out_specs = pl.BlockSpec((ROWS, d_out), lambda i: (i, 0))
    if with_hpre:
        out_shape = (out_shape, jax.ShapeDtypeStruct((M, hidden), x2d.dtype))
        out_specs = (out_specs, pl.BlockSpec((ROWS, hidden), lambda i: (i, 0)))
    return pl.pallas_call(
        functools.partial(_kernel, ln_eps=ln_eps, with_hpre=with_hpre),
        out_shape=out_shape,
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
        out_specs=out_specs,
        compiler_params=_vmem_params(ROWS, D, hidden, d_out, x2d.dtype.itemsize),
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


def _gelu_grad(h_pre):
    """d/dx of exact erf-GELU, fp32 (matches torch nn.GELU backward)."""
    cdf = 0.5 * (1.0 + _erf(h_pre * np.float32(1 / np.sqrt(2))))
    pdf = jnp.exp(-0.5 * h_pre * h_pre) * np.float32(1 / np.sqrt(2 * np.pi))
    return cdf + h_pre * pdf


def _bwd_kernel(x_ref, hpre_ref, g_ref, lns_ref, lnb_ref, w1_ref, w2_ref,
                dx_ref, dlns_ref, dlnb_ref, dw1_ref, db1_ref, dw2_ref,
                db2_ref, *, ln_eps, rows_total):
    i = pl.program_id(0)
    rows = x_ref.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) + i * rows
    mask = row < rows_total

    # where (not multiply): block padding may read back as NaN
    xf = jnp.where(mask, x_ref[:].astype(jnp.float32), 0.0)  # (ROWS, D)
    gf = jnp.where(mask, g_ref[:].astype(jnp.float32), 0.0)  # (ROWS, d_out)
    h_pre = jnp.where(mask, hpre_ref[:].astype(jnp.float32), 0.0)
    lns = lns_ref[:].astype(jnp.float32)

    # recompute only the elementwise pieces (LN stats, GELU); the matmul
    # hidden comes from the saved h_pre
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + ln_eps)
    xhat = (xf - mean) * rstd
    xn = xhat * lns + lnb_ref[:].astype(jnp.float32)
    xn_c = xn.astype(x_ref.dtype)
    h = 0.5 * h_pre * (1.0 + _erf(h_pre * np.float32(1 / np.sqrt(2))))
    h_c = h.astype(x_ref.dtype)

    # fc2 backward
    dh = jax.lax.dot_general(  # g @ w2^T : (ROWS, hidden)
        gf.astype(x_ref.dtype), w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw2_blk = jax.lax.dot_general(  # h^T g : (hidden, d_out)
        h_c, gf.astype(x_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_blk = gf.sum(axis=0, keepdims=True)

    # GELU + fc1 backward
    dh_pre = dh * _gelu_grad(h_pre)
    dh_pre_c = dh_pre.astype(x_ref.dtype)
    dw1_blk = jax.lax.dot_general(  # xn^T dh_pre : (D, hidden)
        xn_c, dh_pre_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_blk = dh_pre.sum(axis=0, keepdims=True)
    dxn = jax.lax.dot_general(  # dh_pre @ w1^T : (ROWS, D)
        dh_pre_c, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    # LayerNorm backward
    dlns_blk = (dxn * xhat).sum(axis=0, keepdims=True)
    dlnb_blk = dxn.sum(axis=0, keepdims=True)
    dxhat = dxn * lns
    dx = rstd * (dxhat
                 - dxhat.mean(axis=-1, keepdims=True)
                 - xhat * (dxhat * xhat).mean(axis=-1, keepdims=True))
    dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _init():
        dlns_ref[:] = dlns_blk
        dlnb_ref[:] = dlnb_blk
        dw1_ref[:] = dw1_blk
        db1_ref[:] = db1_blk
        dw2_ref[:] = dw2_blk
        db2_ref[:] = db2_blk

    @pl.when(i > 0)
    def _acc():
        dlns_ref[:] += dlns_blk
        dlnb_ref[:] += dlnb_blk
        dw1_ref[:] += dw1_blk
        db1_ref[:] += db1_blk
        dw2_ref[:] += dw2_blk
        db2_ref[:] += db2_blk


def _bwd(x2d, hpre, g2d, ln_scale, ln_bias, w1, w2, ln_eps):
    M, D = x2d.shape
    hidden = w1.shape[1]
    d_out = w2.shape[1]
    ROWS = BWD_ROWS
    grid = (pl.cdiv(M, ROWS),)
    acc = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0))
    dx, dlns, dlnb, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, ln_eps=ln_eps, rows_total=M),
        out_shape=(
            jax.ShapeDtypeStruct((M, D), x2d.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, hidden), jnp.float32),
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),
            jax.ShapeDtypeStruct((hidden, d_out), jnp.float32),
            jax.ShapeDtypeStruct((1, d_out), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, D), lambda i: (i, 0)),
            pl.BlockSpec((ROWS, hidden), lambda i: (i, 0)),
            pl.BlockSpec((ROWS, d_out), lambda i: (i, 0)),
            pl.BlockSpec((D,), lambda i: (0,)),
            pl.BlockSpec((D,), lambda i: (0,)),
            pl.BlockSpec((D, hidden), lambda i: (0, 0)),
            pl.BlockSpec((hidden, d_out), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((ROWS, D), lambda i: (i, 0)),
            acc(D), acc(D),
            pl.BlockSpec((D, hidden), lambda i: (0, 0)),
            acc(hidden),
            pl.BlockSpec((hidden, d_out), lambda i: (0, 0)),
            acc(d_out),
        ),
        compiler_params=(
            _vmem_params(ROWS, D, hidden, d_out, x2d.dtype.itemsize, bwd=True)
            or pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)),
        cost_estimate=pl.CostEstimate(
            flops=6 * M * hidden * (D + d_out),
            bytes_accessed=(2 * M * (D + d_out)
                            + 2 * (D + d_out) * hidden) * x2d.dtype.itemsize,
            transcendentals=2 * M * hidden,
        ),
    )(x2d, hpre, g2d, ln_scale, ln_bias, w1, w2)
    return dx, dlns[0], dlnb[0], dw1, db1[0], dw2, db2[0]


def _vjp_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps):
    shape = x.shape
    out, hpre = _fwd(x.reshape(-1, shape[-1]), ln_scale, ln_bias, w1, b1,
                     w2, b2, ln_eps, with_hpre=True)
    out = out.reshape(shape[:-1] + (w2.shape[1],))
    return out, (x, hpre, ln_scale, ln_bias, w1, w2)


def _vjp_bwd(ln_eps, res, g):
    x, hpre, ln_scale, ln_bias, w1, w2 = res
    shape = x.shape
    dx, dlns, dlnb, dw1, db1, dw2, db2 = _bwd(
        x.reshape(-1, shape[-1]), hpre, g.reshape(-1, g.shape[-1]),
        ln_scale, ln_bias, w1, w2, ln_eps)
    return (dx.reshape(shape),
            dlns.astype(ln_scale.dtype), dlnb.astype(ln_bias.dtype),
            dw1.astype(w1.dtype), db1.astype(w1.dtype),
            dw2.astype(w2.dtype), db2.astype(w2.dtype))


fused_prenorm_ffn.defvjp(_vjp_fwd, _vjp_bwd)
