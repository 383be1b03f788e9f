"""Mesh construction and sharding helpers.

The reference's only parallelism is NCCL DDP (SURVEY §2.2). The TPU-native
equivalent: a ``jax.sharding.Mesh`` whose ``data`` axis spans all chips; the
batch is sharded over ``data``, parameters are replicated, and pjit inserts the
gradient psum over ICI automatically. The mesh also carries an optional
``model`` axis so tensor-parallel shardings can be layered on without touching
the train step (attention/ffn kernels already keep their contraction dims
shardable).

Multi-host: ``jax.distributed.initialize()`` must be called before mesh
creation; per-host data loading is keyed by ``jax.process_index()``
(pipeline.py), matching the reference's rank-keyed DistributedSampler
semantics.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: int = -1, model: int = 1, seq: int = 1,
                pipe: int = 1, devices=None) -> Mesh:
    """Build a (data, seq, model[, pipe]) mesh. data=-1 uses all remaining
    devices.

    ``seq`` is the sequence-parallel axis (parallel/sp.py): adjacent devices
    share a clip's tokens, so the per-layer all-to-alls between the divided
    temporal/spatial layouts ride the fastest ICI hops; ``data`` varies
    slowest, as gradient psums tolerate the longer path. ``pipe`` (GPipe
    pipeline stages, parallel/pp.py) varies fastest so the stage-to-stage
    ppermute ring rides adjacent ICI links; the axis only exists when
    pipe > 1, keeping non-pp meshes unchanged."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        assert n % (model * seq * pipe) == 0, (n, model, seq, pipe)
        data = n // (model * seq * pipe)
    assert data * model * seq * pipe == n, (data, seq, model, pipe, n)
    if pipe == 1:
        return Mesh(devices.reshape(data, seq, model), ("data", "seq", "model"))
    return Mesh(devices.reshape(data, seq, model, pipe),
                ("data", "seq", "model", "pipe"))


def shard_batch(mesh: Mesh, tree):
    """Device_put a host batch pytree sharded over the data axis (dim 0)."""
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def shard_local_batch(mesh: Mesh, tree):
    """Multi-host batch assembly: each process passes its LOCAL shard of the
    global batch (dim 0, as produced by the process_index-keyed Loader) and
    gets back the global jax.Array sharded over ``data`` — the TPU-native
    equivalent of DistributedSampler feeding per-rank DDP inputs
    (model_pretrain.py:158-164 world-size semantics). Identical to
    shard_batch in a single-process run."""
    nproc = jax.process_count()

    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if nproc == 1:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0] * nproc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Device_put a pytree fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())
