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
