"""Stacked-blocks trainers: the L identical transformer blocks run over a
STACKED per-layer parameter axis instead of 12 unrolled module calls.

Two users:

- ``ScanLayersTrainer`` (``-scan_layers`` on the CLI): single-mesh training
  where the block stack is ONE ``lax.scan`` over stacked per-layer params.
- ``PipelineTrainer`` (training/pp_trainer.py) extends this with the GPipe
  schedule over a ``pipe`` mesh axis.

MEASURED TRADE-OFF (v5e, TimeSformer-B batch-10 finetune step, fused Pallas
kernels): at 12 layers the scan formulation is a net LOSS vs the unrolled
default — first compile 628 s vs 215 s (XLA:TPU spends longer on the
while-loop wrapping the Mosaic custom-calls than on 12 unrolled copies) and
steady state 151 vs 132 ms/step (the loop boundary blocks cross-layer
scheduling overlap). The optimizer does run ~12× fewer update fusions, but
that ~1.5 ms win is swamped. The unrolled path therefore stays the default;
``-scan_layers`` remains as an opt-in for much deeper stacks (compile cost
grows ~linearly in unrolled depth but is ~flat under scan) and as the
single-mesh twin of the pp layout with interchangeable checkpoints.

Semantics are the reference's exactly (model_trainer.py / optimizer.py):
- stochastic depth keeps the per-layer linspace (transformer.py:543) — the
  rate is scanned alongside each layer's params and applied through the
  ``BasicTransformerBlock`` ``dpr`` override, dropout keys folded per layer;
- the per-PARAMETER grad clip (model_trainer.py:155-170) acts per leading
  slice of the stacked leaves (RefOptimizer.stacked_mask), bit-for-bit the
  unstacked semantics;
- checkpoints stay in the canonical per-layer format (stack on load,
  unstack on save), so scan/pp/dp runs resume each other freely.

Scope: supervised TimeSformer / ViViT joint|divided (homogeneous stacks).
MaskFeat's MViT pyramid is heterogeneous by construction; fact_encoder has
two separate stacks.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from videotransformer_tpu.parallel import pp
from videotransformer_tpu.parallel.mesh import replicate
from videotransformer_tpu.training.optimizer import RefOptimizer, no_decay_mask
from videotransformer_tpu.training.trainer import VideoTransformerTrainer


class StackedBlocksTrainer(VideoTransformerTrainer):
    """Shared machinery: stacked param layout, optimizer masks, canonical
    (per-layer) checkpoint interchange, and the per-layer block module."""

    @staticmethod
    def _check_scope(configs):
        assert configs.objective == "supervised", (
            "stacked-block training: supervised only (MaskFeat/MViT has a "
            "heterogeneous, resolution-changing stack)")
        assert getattr(configs, "arch", "timesformer") in ("timesformer", "vivit")
        assert getattr(configs, "attention_type", "divided_space_time") \
            != "fact_encoder", (
            "fact_encoder has two heterogeneous transformer stacks")

    # -- param layout -------------------------------------------------
    def _num_layers(self):
        return self.model.num_transformer_layers

    def _stack_model_tree(self, model_tree):
        stacked = pp.stack_block_params(model_tree, self._num_layers())
        out = {k: v for k, v in model_tree.items() if k != "transformer_layers"}
        out["transformer_layers"] = stacked
        return out

    def _place_stacked(self, stacked):
        """How the stacked per-layer leaves are placed on the mesh.
        ScanLayers replicates; PipelineTrainer shards over ``pipe``."""
        return replicate(self.mesh, stacked)

    def _place_params(self, params):
        model_tree = self._stack_model_tree(params["model"])
        placed_model = {
            k: (self._place_stacked(v)
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
        # canonical_moments() first: identity under stacking (flat_small is
        # disabled whenever stacked_mask is set), but when the scan path is
        # OFF the base optimizer may hold the fused-flat layout
        return (self.opt_state.step,
                self._unstack_tree(
                    self.optimizer.canonical_moments(self.opt_state.mu)),
                self._unstack_tree(
                    self.optimizer.canonical_moments(self.opt_state.nu)))

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
            return self.optimizer.runtime_moments(replicate(self.mesh, tree))
        return self.optimizer.runtime_moments(self._place_params(tree))

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

    # -- per-layer block module -----------------------------------------
    def _scan_block_and_rates(self):
        from videotransformer_tpu.ops.blocks import BasicTransformerBlock

        model = self.model
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
        # per-layer stochastic-depth linspace (transformer.py:543)
        rates = jnp.linspace(0.0, float(model.drop_path_rate),
                             self._num_layers())
        return block, rates

    def _finish_features(self, x, b, model_params):
        model = self.model
        if model.attention_type == "space_only":
            btot, p_, d_ = x.shape
            x = x.reshape(b, btot // b, p_, d_).mean(axis=1)
        norm = nn.LayerNorm(epsilon=1e-6, dtype=model.dtype)
        x = norm.apply({"params": model_params["norm"]}, x)
        if model.return_cls_token:
            return x[:, 0]
        return x[:, 1:].mean(axis=1)


class ScanLayersTrainer(StackedBlocksTrainer):
    """``-scan_layers``: the block stack runs as one ``lax.scan`` over the
    stacked per-layer params (XLA traces/compiles ONE block body instead of
    L copies). Composes with data parallelism; sp/tp keep the unrolled path
    (their shard_map'd kernels are not exercised under scan)."""

    def __init__(self, configs, ckpt_dir=None, do_eval=False, do_test=False,
                 n_crops=3, mesh=None, seed=None, log_dir=None):
        self._check_scope(configs)
        assert getattr(configs, "sp", 1) == 1 and getattr(configs, "tp", 1) == 1, (
            "-scan_layers composes with data parallelism only; drop the flag "
            "for sp/tp runs")
        super().__init__(configs, ckpt_dir=ckpt_dir, do_eval=do_eval,
                         do_test=do_test, n_crops=n_crops, mesh=mesh,
                         seed=seed, log_dir=log_dir)

    def _forward_features(self, model_params, video, deterministic, rngs=None):
        model = self.model
        det = bool(deterministic)
        block, rates = self._scan_block_and_rates()
        L = self._num_layers()
        drop_key = None if rngs is None else rngs.get("dropout")

        tokens, b = model.apply(
            {"params": model_params}, video, deterministic=det,
            method="prepare_tokens", rngs=None if det else rngs)
        stacked = model_params["transformer_layers"]

        no_drop = det or model.drop_path_rate == 0.0 or drop_key is None

        def body(h, sc):
            lp, rate, li = sc
            if no_drop:
                out = block.apply({"params": lp}, h, deterministic=det)
            else:
                key = jax.random.fold_in(drop_key, li)
                out = block.apply({"params": lp}, h, deterministic=False,
                                  dpr=rate, rngs={"dropout": key})
            return out, None

        if getattr(self.configs, "remat", False):
            body = jax.checkpoint(body)  # classic scan-of-remat-block memory
        x, _ = jax.lax.scan(body, tokens,
                            (stacked, rates, jnp.arange(L, dtype=jnp.int32)))
        return self._finish_features(x, b, model_params)
