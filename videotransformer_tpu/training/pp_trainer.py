"""Pipeline-parallel trainer: GPipe over a ``pipe`` mesh axis, integrated
with the full supervised training loop.

The reference has no pipeline parallelism (its DDP replicates the whole
model, SURVEY §2.2); this is the TPU-native extension that scales model
DEPTH across chips while keeping every reference training semantic:
device-side augmentation, mixup, the per-parameter clipped AdamW/SGD with
no-decay groups (training/optimizer.py), per-epoch schedules, metrics, and
orbax checkpointing — checkpoints stay in the canonical per-layer format, so
a pp run resumes on a dp mesh and vice versa.

Design (see parallel/pp.py for the schedule):
- the L per-layer block subtrees are STACKED on a leading axis and sharded
  over ``pipe`` — device p physically holds only its L/P layers (and only
  its slice of the Adam moments);
- the train step's forward runs prepare_tokens replicated, then the block
  stack as a GPipe pipeline (M microbatches, one ppermute per tick), then
  the head; jax.grad through the schedule yields the exact microbatch-
  accumulated backward;
- stochastic depth keeps the reference's per-layer linspace
  (transformer.py:543): the rate is scanned alongside each layer's params
  and applied through the BasicTransformerBlock ``dpr`` override, with
  dropout keys folded per (layer, microbatch);
- the per-PARAMETER grad clip (model_trainer.py:155-170) acts per leading
  slice of the stacked leaves (RefOptimizer.stacked_mask), so clipping is
  bit-for-bit the unstacked semantics.

The stacked-layout machinery (param stacking, optimizer masks, canonical
checkpoint interchange) is shared with the single-mesh ``-scan_layers``
trainer — see training/stacked_trainer.py.

Composes with data parallelism (each data column pipelines its own batch
shard). Tensor/sequence parallelism are mutually exclusive with pp here —
their shard_map'd kernels cannot nest inside the pipeline's shard_map.

Scope: supervised TimeSformer/ViViT (homogeneous block stacks). MaskFeat's
MViT has a heterogeneous, resolution-changing stack — pipeline stages would
be unbalanced by construction; use dp/tp for it.
"""

import jax

from videotransformer_tpu.parallel import pp
from videotransformer_tpu.parallel.mesh import create_mesh
from videotransformer_tpu.training.stacked_trainer import StackedBlocksTrainer


class PipelineTrainer(StackedBlocksTrainer):
    """Drop-in VideoTransformerTrainer with the transformer stack pipelined
    over ``mesh['pipe']`` (``-pp N`` on the CLI)."""

    def __init__(self, configs, ckpt_dir=None, do_eval=False, do_test=False,
                 n_crops=3, mesh=None, seed=None, log_dir=None):
        pp_size = int(getattr(configs, "pp", 2))
        assert pp_size > 1, "PipelineTrainer needs -pp > 1"
        self.pp_size = pp_size
        self.pp_microbatches = int(getattr(configs, "pp_microbatch", 0) or 0) \
            or pp_size
        self._check_scope(configs)
        assert getattr(configs, "sp", 1) == 1 and getattr(configs, "tp", 1) == 1, (
            "pp composes with data parallelism only: the sp/tp shard_map'd "
            "kernels cannot nest inside the pipeline shard_map")
        if mesh is None:
            mesh = create_mesh(pipe=pp_size)
        assert "pipe" in mesh.axis_names, mesh.axis_names
        assert dict(mesh.shape)["pipe"] == pp_size, (mesh.shape, pp_size)
        super().__init__(configs, ckpt_dir=ckpt_dir, do_eval=do_eval,
                         do_test=do_test, n_crops=n_crops, mesh=mesh,
                         seed=seed, log_dir=log_dir)
        assert self.model.num_transformer_layers % pp_size == 0, (
            self.model.num_transformer_layers, pp_size)

    def _place_stacked(self, stacked):
        return pp.shard_stacked_params(self.mesh, stacked)

    # -- forward ------------------------------------------------------
    def _forward_features(self, model_params, video, deterministic, rngs=None):
        model = self.model
        det = bool(deterministic)
        block, rates = self._scan_block_and_rates()
        drop_key = None if rngs is None else rngs.get("dropout")

        tokens, b = model.apply(
            {"params": model_params}, video, deterministic=det,
            method="prepare_tokens", rngs=None if det else rngs)
        M = self.pp_microbatches
        bt = tokens.shape[0]
        data_size = dict(self.mesh.shape).get("data", 1)
        assert bt % M == 0 and (bt // M) % data_size == 0, (
            f"pipeline microbatching needs batch rows ({bt}) divisible by "
            f"microbatches ({M}) x data axis ({data_size}); adjust "
            f"-batch_size or -pp_microbatch")
        # row r -> microbatch r % M: shard-local under data sharding (both bt
        # and bt//M are multiples of the data axis), so the split inserts no
        # collective
        mbs = tokens.reshape(bt // M, M, *tokens.shape[1:]).swapaxes(0, 1)

        stacked = model_params["transformer_layers"]
        if det or model.drop_path_rate == 0.0 or drop_key is None:
            def block_apply(lp, h, rate, li, mb):
                return block.apply({"params": lp}, h, deterministic=det)
        else:
            def block_apply(lp, h, rate, li, mb):
                key = jax.random.fold_in(jax.random.fold_in(drop_key, li), mb)
                return block.apply({"params": lp}, h, deterministic=False,
                                   dpr=rate, rngs={"dropout": key})

        out = pp.pipeline_blocks(block_apply, stacked, mbs, self.mesh,
                                 axis="pipe", extras=rates, indexed=True)
        x = out.swapaxes(0, 1).reshape(bt, *out.shape[2:])
        return self._finish_features(x, b, model_params)
