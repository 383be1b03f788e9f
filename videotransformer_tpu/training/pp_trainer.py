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

Composes with data parallelism (each data column pipelines its own batch
shard). Tensor/sequence parallelism are mutually exclusive with pp here —
their shard_map'd kernels cannot nest inside the pipeline's shard_map.

Scope: supervised TimeSformer/ViViT (homogeneous block stacks). MaskFeat's
MViT has a heterogeneous, resolution-changing stack — pipeline stages would
be unbalanced by construction; use dp/tp for it.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from videotransformer_tpu.parallel import pp
from videotransformer_tpu.parallel.mesh import create_mesh, replicate
from videotransformer_tpu.training.optimizer import RefOptimizer, no_decay_mask
from videotransformer_tpu.training.trainer import VideoTransformerTrainer


class PipelineTrainer(VideoTransformerTrainer):
    """Drop-in VideoTransformerTrainer with the transformer stack pipelined
    over ``mesh['pipe']`` (``-pp N`` on the CLI)."""

    def __init__(self, configs, ckpt_dir=None, do_eval=False, do_test=False,
                 n_crops=3, mesh=None, seed=None, log_dir=None):
        pp_size = int(getattr(configs, "pp", 2))
        assert pp_size > 1, "PipelineTrainer needs -pp > 1"
        self.pp_size = pp_size
        self.pp_microbatches = int(getattr(configs, "pp_microbatch", 0) or 0) \
            or pp_size
        assert configs.objective == "supervised", (
            "pipeline parallelism: supervised training only (MaskFeat/MViT "
            "has a heterogeneous stage-unbalanced stack)")
        assert getattr(configs, "arch", "timesformer") in ("timesformer", "vivit")
        assert getattr(configs, "attention_type", "divided_space_time") \
            != "fact_encoder", (
            "fact_encoder has two heterogeneous transformer stacks")
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

    # -- param layout -------------------------------------------------
    def _num_layers(self):
        return self.model.num_transformer_layers

    def _stack_model_tree(self, model_tree):
        stacked = pp.stack_block_params(model_tree, self._num_layers())
        out = {k: v for k, v in model_tree.items() if k != "transformer_layers"}
        out["transformer_layers"] = stacked
        return out

    def _place_params(self, params):
        model_tree = self._stack_model_tree(params["model"])
        placed_model = {
            k: (pp.shard_stacked_params(self.mesh, v)
                if k == "transformer_layers" else replicate(self.mesh, v))
            for k, v in model_tree.items()
        }
        placed = {k: replicate(self.mesh, v)
                  for k, v in params.items() if k != "model"}
        placed["model"] = placed_model
        return placed

    def _canonical_params(self):
        return self._unstack_tree(self.params)

    def _canonical_opt_moments(self):
        return (self.opt_state.step,
                self._unstack_tree(self.opt_state.mu),
                self._unstack_tree(self.opt_state.nu))

    def _unstack_tree(self, tree):
        if not (isinstance(tree, dict) and "model" in tree
                and "transformer_layers" in tree["model"]):
            return tree
        model = dict(tree["model"])
        model["transformer_layers"] = pp.unstack_block_params(
            model["transformer_layers"], self._num_layers())
        out = dict(tree)
        out["model"] = model
        return out

    def _place_opt_moment(self, tree):
        if not (isinstance(tree, dict) and "model" in tree
                and "transformer_layers" in tree["model"]):
            return replicate(self.mesh, tree)
        return self._place_params(tree)

    # -- optimizer ----------------------------------------------------
    def _make_optimizer(self, opt_tree):
        if self.linear_prob:
            return super()._make_optimizer(opt_tree)
        # masks computed on the canonical tree, then restructured to the
        # stacked runtime layout: the no-decay rule (1-D / bias / skip
        # keywords) is identical for every layer, so the stacked subtree
        # reuses layer 0's mask; stacked_mask marks the per-layer leaves so
        # the per-parameter clip acts per slice (exact reference semantics)
        nd = no_decay_mask(opt_tree)
        nd_model = dict(nd["model"])
        nd_model["transformer_layers"] = nd["model"]["transformer_layers"]["layers_0"]
        nd_st = dict(nd)
        nd_st["model"] = nd_model
        smask = jax.tree.map(lambda _: False, nd_st)
        sm_model = dict(smask["model"])
        sm_model["transformer_layers"] = jax.tree.map(
            lambda _: True, nd_st["model"]["transformer_layers"])
        smask = dict(smask)
        smask["model"] = sm_model
        return RefOptimizer(
            optim_type=self.configs.optim_type,
            clip_grad=getattr(self.configs, "clip_grad", 0.0),
            nd_mask=nd_st,
            stacked_mask=smask,
        )

    # -- forward ------------------------------------------------------
    def _forward_features(self, model_params, video, deterministic, rngs=None):
        from videotransformer_tpu.ops.blocks import BasicTransformerBlock

        model = self.model
        det = bool(deterministic)
        operator_order = (("time_attn", "space_attn", "ffn")
                          if model.attention_type == "divided_space_time"
                          else ("self_attn", "ffn"))
        eff_frames = model.num_frames // getattr(model, "tube_size", 1)
        block = BasicTransformerBlock(
            embed_dims=model.embed_dims, num_heads=model.num_heads,
            num_frames=eff_frames,
            hidden_channels=model.embed_dims * 4,
            operator_order=operator_order,
            dpr=0.0, dtype=model.dtype)
        L = self._num_layers()
        # per-layer stochastic-depth linspace (transformer.py:543), scanned
        # alongside the stacked params
        rates = jnp.linspace(0.0, float(model.drop_path_rate), L)
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

        if model.attention_type == "space_only":
            btot, p_, d_ = x.shape
            x = x.reshape(b, btot // b, p_, d_).mean(axis=1)
        norm = nn.LayerNorm(epsilon=1e-6, dtype=model.dtype)
        x = norm.apply({"params": model_params["norm"]}, x)
        if model.return_cls_token:
            return x[:, 0]
        return x[:, 1:].mean(axis=1)
