"""Sequence parallelism for divided space-time attention.

The reference has no sequence parallelism (its DDP replicates the whole
sequence per GPU, SURVEY §2.2); this is the TPU-native extension that scales
the TOKEN axis across chips — longer clips / higher resolutions than one
chip's HBM can hold.

The key observation is that divided space-time attention (TimeSformer,
video_transformer.py:206-316) is *naturally* sequence-parallel on a TPU mesh:

- temporal attention attends within a fixed patch p across frames t: with the
  patch-major token layout ``b (p t) d`` sharded over patches, every length-t
  attention row is device-local;
- spatial attention attends within a fixed frame t across patches p: sharded
  over frames, every length-(p+1) attention row is device-local.

So a layer needs exactly one resharding between the two layouts — patches
<-> frames — which XLA lowers to an all-to-all over the ``seq`` mesh axis
(the cheapest collective: each device keeps 1/sp of its data). Nothing is
ever all-gathered; FFN/LN/mixup run on whichever token sharding is live.

We express this with ``jax.lax.with_sharding_constraint`` at the two layout
points inside the blocks (ops/blocks.py) and let pjit's SPMD propagation do
the rest. The Pallas kernels are run per-shard under ``jax.shard_map`` (see
``row_sharded_call``) so their grids see static local shapes.

Activation constraints need runtime state (the mesh and whether sp is on);
flax modules are pure, so the state lives here as an explicitly-set module
global, mirroring config.set_attention_backend. The trainer enables it when
``-sp > 1`` (training/trainer.py) and the CPU-mesh tests drive it directly.
"""

from contextlib import contextmanager

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

_STATE = {"mesh": None, "axis": "seq", "data_axis": "data"}


def enable_sequence_parallel(mesh, axis: str = "seq",
                             data_axis: str = "data") -> None:
    """Turn on sequence-parallel activation sharding over ``mesh[axis]``."""
    assert axis in mesh.axis_names, (axis, mesh.axis_names)
    _STATE.update(mesh=mesh, axis=axis, data_axis=data_axis)


def disable_sequence_parallel() -> None:
    _STATE["mesh"] = None


@contextmanager
def sequence_parallel(mesh, axis: str = "seq", data_axis: str = "data"):
    enable_sequence_parallel(mesh, axis, data_axis)
    try:
        yield
    finally:
        disable_sequence_parallel()


def active() -> bool:
    m = _STATE["mesh"]
    return m is not None and dict(m.shape).get(_STATE["axis"], 1) > 1


def seq_size() -> int:
    return dict(_STATE["mesh"].shape)[_STATE["axis"]] if active() else 1


def _row_spec(ndim):
    """Leading (batch·sequence-position) axis sharded over (data, seq)."""
    return P((_STATE["data_axis"], _STATE["axis"]), *([None] * (ndim - 1)))


def constrain_rows(x):
    """Constrain a row-major activation — (b·p, t, d) before temporal
    attention or (b·t, p(+1), d) before spatial attention — so each device
    owns complete attention rows. The flattened leading axis is b-major, so
    sharding it over ("data", "seq") is exactly b over data and p (resp. t)
    over seq; the temporal->spatial transition becomes one all-to-all."""
    if not active():
        return x
    st = _STATE
    if x.shape[0] % (dict(st["mesh"].shape)[st["data_axis"]]
                     * dict(st["mesh"].shape)[st["axis"]]):
        return x  # not divisible (e.g. odd eval remainder): let XLA choose
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(st["mesh"], _row_spec(x.ndim)))


def constrain_tokens(x):
    """Constrain the token-major form (b, n, d) between blocks: batch over
    data, tokens over seq. n = 1 + p·t is NOT divisible by sp (the cls
    token); XLA pads the last shard — fine for the elementwise FFN/LN ops
    that run in this layout."""
    if not active():
        return x
    st = _STATE
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(st["mesh"],
                         P(st["data_axis"], st["axis"], *([None] * (x.ndim - 2)))))


def row_sharded_call(fn, x, *args):
    """Run ``fn(x, *args)`` with x's leading row axis sharded over
    (data, seq) and everything in ``args`` replicated, via jax.shard_map.

    This is how the fused Pallas kernels execute under sequence parallelism:
    a pallas_call has no SPMD partitioning rule, so under plain pjit it would
    force its operands replicated; shard_map instead hands the kernel its
    static per-device block — attention rows are complete on-device by
    construction (constrain_rows), so the kernel body needs no collectives.
    fn must be shape-polymorphic over the leading axis (the packed temporal
    path recomputes its pack group from the local row count).
    """
    if not active():
        return fn(x, *args)
    st = _STATE
    mesh = st["mesh"]
    nshard = (dict(mesh.shape)[st["data_axis"]] * dict(mesh.shape)[st["axis"]])
    if x.shape[0] % nshard:
        return fn(x, *args)
    spec = _row_spec(x.ndim)
    other = tuple(P() for _ in args)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(spec,) + other, out_specs=spec,
        check_vma=False)(x, *args)


def fused_sharded_call(fn, x, lns, lnb, w_col, b_col, w_row, b_row,
                       token_major=False, head_fn=None, qkv_head_dim=None):
    """Dispatch a fused LN -> column-matmul -> ... -> row-matmul op (the
    Pallas prenorm-MHSA or prenorm-FFN kernels share this exact weight
    pattern) across whatever parallelism is active:

    - neither sp nor tp: plain ``fn(x, lns, lnb, w_col, b_col, w_row, b_row)``.
    - sp only: rows over (data, seq) via row_sharded_call / token_sharded_call
      with replicated weights (the original behavior).
    - tp (optionally + sp): ONE shard_map over the mesh — rows over
      (data[, seq]), ``w_col``/``b_col`` column-sharded and ``w_row``
      row-sharded over 'model' (matching parallel/tp.shard_params_tp), a
      psum over 'model' of the partial row-matmul output inside the body,
      and the row bias added OUTSIDE the shard_map (one add in pjit land, so
      its gradient is exact — an in-body add after the psum would get its
      cotangent over-reduced by the shard_map transpose).

    ``qkv_head_dim``: set to the per-head dim for MHSA weights — the fused
    QKV layout is [q|k|v], so a contiguous 'model' shard is not a valid
    local QKV block; the columns are permuted into per-head-group [q|k|v]
    blocks first (tp.qkv_head_block_perm). ``fn`` must derive its head count
    from the weight shard's shape, not a static config value.

    Falls back to the gathered/XLA-managed path (plain fn) when shapes don't
    divide the mesh — correct, just slower.
    """
    from videotransformer_tpu.parallel import tp as vt_tp

    # mutually exclusive by construction: token_major is the FFN path,
    # qkv_head_dim the MHSA path. The head-block permutation below is applied
    # before the token-major cls-peel fallbacks, so a combined caller would
    # silently hand head_fn/fn permuted weights — fail loudly instead.
    assert not (token_major and qkv_head_dim is not None), (
        "fused_sharded_call: token_major and qkv_head_dim are exclusive")

    if not vt_tp.active():
        if token_major:
            return token_sharded_call(
                fn, x, lns, lnb, w_col, b_col, w_row, b_row, head_fn=head_fn)
        return row_sharded_call(fn, x, lns, lnb, w_col, b_col, w_row, b_row)

    mesh = vt_tp._STATE["mesh"]
    model_ax = vt_tp._STATE["axis"]
    data_ax = vt_tp._STATE["data_axis"]
    seq_ax = vt_tp._STATE["seq_axis"]
    shape = dict(mesh.shape)
    tpn = shape[model_ax]
    dp = shape.get(data_ax, 1)
    spn = shape.get(seq_ax, 1) if active() else 1

    # divisibility guards -> gathered fallback
    n_cols = w_col.shape[1]
    if qkv_head_dim is not None:
        heads = n_cols // (3 * qkv_head_dim)
        divisible = heads % tpn == 0 and w_row.shape[0] % tpn == 0
    else:
        divisible = n_cols % tpn == 0 and w_row.shape[0] % tpn == 0
    if token_major:
        rows_ok = x.shape[0] % dp == 0
    else:
        rows_ok = x.shape[0] % (dp * spn) == 0
    if not (divisible and rows_ok):
        return fn(x, lns, lnb, w_col, b_col, w_row, b_row)

    if qkv_head_dim is not None:
        # NB this gather runs inside the traced step, so each step re-derives
        # the permuted qkv weight before sharding (~3.5 MB copy per layer at
        # B/16). Storing the weight pre-permuted at shard_params_tp placement
        # would hoist it, but couples the runtime param layout to tp and
        # forces an inverse permutation through every checkpoint/export/
        # canonicalization path — rejected while tp>1 has no hardware to
        # measure the ~0.2 ms/step it would buy (see PARITY.md §2.2 caveat).
        perm = vt_tp.qkv_head_block_perm(w_row.shape[0], heads, tpn)
        w_col = w_col[:, perm]
        b_col = b_col[perm]

    def body(xl, lns_, lnb_, wc, bc, wr):
        out = fn(xl, lns_, lnb_, wc, bc, wr,
                 jnp.zeros((wr.shape[-1],), xl.dtype))
        return jax.lax.psum(out, model_ax)

    if token_major:
        spec_x = P(data_ax, seq_ax if spn > 1 else None,
                   *([None] * (x.ndim - 2)))
    else:
        spec_x = P((data_ax, seq_ax) if spn > 1 else data_ax,
                   *([None] * (x.ndim - 1)))
    in_specs = (spec_x, P(), P(), P(None, model_ax), P(model_ax),
                P(model_ax, None))
    sharded = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                            out_specs=spec_x, check_vma=False)

    n = x.shape[1]
    if token_major and spn > 1 and n % spn:
        # cls-token peel (see token_sharded_call): head row through the jnp
        # twin on full (sharded-in-pjit-land) weights
        if n > 1 and (n - 1) % spn == 0 and head_fn is not None:
            head = head_fn(x[:, :1], lns, lnb, w_col, b_col, w_row, b_row)
            tail = sharded(x[:, 1:], lns, lnb, w_col, b_col, w_row) + b_row
            return jnp.concatenate([head.astype(x.dtype),
                                    tail.astype(x.dtype)], axis=1)
        return fn(x, lns, lnb, w_col, b_col, w_row, b_row)
    out = sharded(x, lns, lnb, w_col, b_col, w_row) + b_row
    return out.astype(x.dtype)


def ring_eligible(x) -> bool:
    """Ring attention preconditions: sp on, batch divisible by the data axis,
    and at least one token per seq shard."""
    if not active():
        return False
    st = _STATE
    dp = dict(st["mesh"].shape)[st["data_axis"]]
    spn = dict(st["mesh"].shape)[st["axis"]]
    return x.shape[0] % dp == 0 and x.shape[1] >= spn


def ring_prenorm_mhsa(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                      num_heads, scale, eps=1e-5):
    """Sequence-parallel prenorm-MHSA for GLOBAL (joint space-time) attention.

    Divided attention is sequence-parallel for free (rows are device-local,
    ``constrain_rows``); joint attention rows span the WHOLE token axis, so
    sharding tokens needs cross-device attention. The TPU-native answer is
    ring attention (cf. the scaling-book collective-matmul recipe): each
    device keeps its Q shard and its K/V shard, and the K/V blocks rotate
    around the ``seq`` ring — one ``ppermute`` of a (b, n/sp, d) block per
    step, overlappable with the block's matmuls — while a running online
    softmax (m, l, acc) accumulates exact attention. Nothing is ever
    all-gathered: per-chip activation memory stays O(n/sp) and the (n, n)
    score matrix never exists, which is what lets joint/ViViT-style models
    scale past one chip's HBM on the token axis.

    x: (b, n, d) with b over ``data`` and n over ``seq`` (cls token included;
    n need not divide sp — the tail shard is padded and masked out).
    Weights replicated. Returns the attention output (pre-residual), same
    sharding as x. Backward differentiates through the scan/ppermute (the
    reverse ring), so no hand-written VJP is needed.

    Gradient note: the replicated weight operands get their cotangents
    psum'd over (data, seq) by shard_map's transpose, preserving the exact
    data-parallel gradient (verified against the dense path in
    tests/test_ring_attention.py).
    """
    st = _STATE
    mesh = st["mesh"]
    axis, data_axis = st["axis"], st["data_axis"]
    S = dict(mesh.shape)[axis]
    b, n, d = x.shape
    n_l = -(-n // S)  # ceil
    pad = n_l * S - n
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
    head_dim = d // num_heads

    def local_fn(xl, lns, lnb, wq, bq, wp, bp):
        # xl: (b_l, n_l, d) — this device's token shard
        p_seq = jax.lax.axis_index(axis)
        xf = xl.astype(jnp.float32)
        # flax LayerNorm numerics (fast variance)
        mu = xf.mean(-1, keepdims=True)
        var = (xf * xf).mean(-1, keepdims=True) - mu * mu
        xn = ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(xl.dtype)
        xn = xn * lns + lnb
        qkv = (xn @ wq + bq).reshape(xl.shape[0], n_l, 3, num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4)  # (3, b_l, H, n_l, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]

        perm = [(j, (j + 1) % S) for j in range(S)]
        m0 = jnp.full(q.shape[:3], -jnp.inf, jnp.float32)
        l0 = jnp.zeros(q.shape[:3], jnp.float32)
        acc0 = jnp.zeros(q.shape, jnp.float32)

        def step(carry, i):
            m, l, acc, k_blk, v_blk = carry
            s = jnp.einsum("bhnd,bhmd->bhnm", q, k_blk,
                           preferred_element_type=jnp.float32) * scale
            # the rotating block at step i originated on seq device
            # (p_seq - i) mod S; only its first (n - origin*n_l) cols are
            # real tokens — the tail shard carries the divisibility padding
            origin = jax.lax.rem(p_seq - i + S, S)
            valid = jnp.clip(n - origin * n_l, 0, n_l)
            s = jnp.where(jnp.arange(n_l)[None, None, None, :] < valid,
                          s, -1e30)
            m_new = jnp.maximum(m, s.max(-1))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new[..., None])
            l = l * alpha + p.sum(-1)
            acc = acc * alpha[..., None] + jnp.einsum(
                "bhnm,bhmd->bhnd", p.astype(xl.dtype), v_blk,
                preferred_element_type=jnp.float32)
            k_blk = jax.lax.ppermute(k_blk, axis, perm)
            v_blk = jax.lax.ppermute(v_blk, axis, perm)
            return (m_new, l, acc, k_blk, v_blk), None

        (_, l, acc, _, _), _ = jax.lax.scan(
            step, (m0, l0, acc0, k, v), jnp.arange(S))
        out = (acc / jnp.maximum(l, 1e-30)[..., None]).astype(xl.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(xl.shape[0], n_l, d)
        return out @ wp + bp

    spec_x = P(data_axis, axis, None)
    spec_w = tuple(P() for _ in range(6))
    out = jax.shard_map(
        local_fn, mesh=mesh, in_specs=(spec_x,) + spec_w,
        out_specs=spec_x, check_vma=False)(
            xp, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj)
    return out[:, :n] if pad else out


def token_sharded_call(fn, x, *args, head_fn=None):
    """Run ``fn(x, *args)`` on a token-major activation (b, n, d) with the
    batch over data and the token axis over seq — the sequence-parallel form
    of the fused FFN, whose rows are independent. shard_map needs divisible
    shards; the TimeSformer token count n = 1 + p·t is odd by one (the cls
    token), so the cls row is peeled off and run through ``head_fn`` (a pure
    jnp equivalent of fn — one row of a per-token op, numerically free as
    FFN(concat) == concat(FFN); a pallas_call outside shard_map cannot carry
    a replicated sharding)."""
    if not active():
        return fn(x, *args)
    st = _STATE
    mesh = st["mesh"]
    dp = dict(mesh.shape)[st["data_axis"]]
    spn = dict(mesh.shape)[st["axis"]]
    b, n = x.shape[0], x.shape[1]
    if b % dp:
        return fn(x, *args)
    spec = P(st["data_axis"], st["axis"], *([None] * (x.ndim - 2)))
    other = tuple(P() for _ in args)
    sharded = jax.shard_map(fn, mesh=mesh, in_specs=(spec,) + other,
                            out_specs=spec, check_vma=False)
    if n % spn == 0:
        return sharded(x, *args)
    if n > 1 and (n - 1) % spn == 0 and head_fn is not None:
        head = head_fn(x[:, :1], *args)
        return jnp.concatenate(
            [head.astype(x.dtype), sharded(x[:, 1:], *args)], axis=1)
    return fn(x, *args)
