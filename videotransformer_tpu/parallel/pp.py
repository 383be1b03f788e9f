"""Pipeline parallelism (GPipe schedule) for the transformer block stack.

The reference has no pipeline parallelism (SURVEY §2.2); this is the
TPU-native extension that scales model DEPTH across chips: each device owns
a contiguous stage of transformer blocks, microbatches flow through the
stages in a rotating schedule, and the only communication is a point-to-point
``ppermute`` of one activation block per tick over the ring — the natural fit
for the TPU's ICI torus.

Formulation (the standard JAX "stacked stages + shard_map" pipeline, cf. the
scaling-book recipe): the L per-layer parameter subtrees
``transformer_layers/layers_{i}`` are stacked on a new leading axis and
sharded over the mesh ``pipe`` axis, so device p physically holds ONLY its
L/P layers. Inside ``jax.shard_map`` every device runs the same program:

    for t in range(M + P - 1):              # M microbatches, P stages
        inp  = microbatch[t]   if p == 0 else state      # feed the head
        out  = scan(blocks_p, inp)                       # my L/P layers
        collect out at p == P-1 for microbatch t-(P-1)   # drain the tail
        state = ppermute(out, p -> p+1)                  # rotate the ring

Differentiating through the scan/ppermute gives the exact GPipe backward
(activation grads flow the reverse ring; weight grads accumulate across the
microbatches a stage processed) — no hand-written schedule needed, XLA sees
a static loop. The (M + P - 1)/M bubble overhead is the classic GPipe cost;
raise M to amortize.

Scope: homogeneous block stacks (every model here qualifies — TimeSformer /
ViViT joint/divided: 12 identical ``BasicTransformerBlock``s). Stochastic
depth must be disabled under pp (DropPath rates are per-layer module
constants and cannot vary across a stacked scan); pass deterministic=True or
build the model with drop_path_rate=0 — asserted below.

Used standalone (``pipelined_forward_features``) for depth-sharded inference
/ serving of models too deep for one chip's HBM; composes with the trainer's
data/tensor axes in principle (stack the mesh), verified here on a
pipe-only mesh (tests/test_pipeline_parallel.py).
"""


import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def stack_block_params(model_params, num_layers):
    """Stack ``transformer_layers/layers_{i}`` subtrees on a new leading
    axis (the canonical checkpoint tree stays per-layer; stacking is a
    runtime view for the pipeline)."""
    layers = [model_params["transformer_layers"][f"layers_{i}"]
              for i in range(num_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)


def unstack_block_params(stacked, num_layers):
    """Inverse of stack_block_params (checkpoint export under pp)."""
    return {f"layers_{i}": jax.tree.map(lambda x: x[i], stacked)
            for i in range(num_layers)}


def shard_stacked_params(mesh, stacked, axis="pipe"):
    """Place the stacked layer axis over the mesh pipe axis: device p holds
    only its stage's layers."""
    def put(x):
        return jax.device_put(
            x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))

    return jax.tree.map(put, stacked)


def pipeline_blocks(block_apply, stacked_params, microbatches, mesh,
                    axis="pipe", data_axis=None, extras=None, indexed=False):
    """Run the block stack as a GPipe pipeline over ``mesh[axis]``.

    block_apply: (layer_params, x) -> x — one transformer block. With
        ``extras`` it is called as (layer_params, x, extra); with
        ``indexed=True`` as (layer_params, x, extra, layer_idx, mb_idx)
        where layer_idx is the GLOBAL layer index and mb_idx the microbatch
        being processed (both traced scalars) — the hooks the trainer uses
        for per-layer DropPath rates and per-(layer, microbatch) dropout
        keys under pipeline-parallel TRAINING.
    stacked_params: leaves (L, ...), L = P * layers_per_stage, sharded or
        shardable over ``axis``.
    extras: optional pytree of per-layer data, leaves (L, ...), scanned and
        sharded alongside the params.
    microbatches: (M, mb, N, D) — M microbatches of the token activations.
    Returns (M, mb, N, D), numerically identical to applying the L blocks
    sequentially to each microbatch.

    Composes with data parallelism: when ``data_axis`` names another mesh
    axis (or one named "data" exists), the microbatch row dim is sharded
    over it — each data column of the mesh pipelines its own batch shard,
    and the ppermute/psum stay scoped to the pipe axis.
    """
    p_size = dict(mesh.shape)[axis]
    M = microbatches.shape[0]
    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    assert n_layers % p_size == 0, (n_layers, p_size)
    per_stage = n_layers // p_size
    if data_axis is None and "data" in mesh.axis_names:
        data_axis = "data"
    if data_axis is not None and dict(mesh.shape)[data_axis] > 1:
        x_spec = P(None, data_axis, *([None] * (microbatches.ndim - 2)))
    else:
        x_spec = P()
    if extras is None:
        extras = ()  # shard_map needs a pytree, not None
    has_extras = len(jax.tree.leaves(extras)) > 0

    def per_device(local_params, local_extras, mbs):
        # local_params leaves: (L/P, ...); mbs: (M, mb, N, D) (replicated)
        p = jax.lax.axis_index(axis)
        ticks = M + p_size - 1

        def stage(x, mb_idx):
            local_idx = jnp.arange(per_stage) + p * per_stage

            def layer(h, sc):
                lp, ex, li = sc
                if indexed:
                    return block_apply(lp, h, ex, li, mb_idx), None
                if has_extras:
                    return block_apply(lp, h, ex), None
                return block_apply(lp, h), None

            out, _ = jax.lax.scan(
                layer, x, (local_params, local_extras, local_idx))
            return out

        state = jnp.zeros_like(mbs[0])
        outputs = jnp.zeros_like(mbs)

        def tick(carry, t):
            state, outputs = carry
            feed = mbs[jnp.clip(t, 0, M - 1)]
            inp = jnp.where(p == 0, feed, state)
            # the microbatch flowing through stage p at tick t (warmup /
            # cooldown ticks process don't-care data; clip keeps it in range)
            out = stage(inp, jnp.clip(t - p, 0, M - 1))
            idx = t - (p_size - 1)
            valid = (p == p_size - 1) & (idx >= 0)
            slot = jnp.clip(idx, 0, M - 1)
            outputs = outputs.at[slot].set(
                jnp.where(valid, out, outputs[slot]))
            state = jax.lax.ppermute(
                out, axis, [(i, (i + 1) % p_size) for i in range(p_size)])
            return (state, outputs), None

        (_, outputs), _ = jax.lax.scan(
            tick, (state, outputs), jnp.arange(ticks))
        # outputs are populated on the last stage only; the masked psum
        # replicates them to every device (zeros elsewhere)
        return jax.lax.psum(outputs, axis)

    spec_p = jax.tree.map(
        lambda x: P(axis, *([None] * (x.ndim - 1))), stacked_params)
    spec_e = jax.tree.map(
        lambda x: P(axis, *([None] * (x.ndim - 1))), extras)
    return jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(spec_p, spec_e, x_spec), out_specs=x_spec,
        check_vma=False)(stacked_params, extras, microbatches)


def pipelined_forward_features(model, params, video, mesh, microbatches=4,
                               axis="pipe", deterministic=True):
    """Depth-sharded forward pass of a homogeneous-stack model (TimeSformer/
    ViViT joint): prepare_tokens and the final norm run replicated (a few
    percent of the FLOPs), the L transformer blocks run as a GPipe pipeline
    over ``mesh[axis]``. Returns the model's feature output.
    """
    import flax.linen as nn

    from videotransformer_tpu.ops.blocks import BasicTransformerBlock

    assert deterministic or model.drop_path_rate == 0.0, (
        "stochastic depth rates are per-layer constants; disable drop_path "
        "under pipeline parallelism")
    assert model.attention_type != "fact_encoder", (
        "fact_encoder has two heterogeneous transformer stacks; pipeline "
        "the spatial stack via pipeline_blocks directly")
    operator_order = (("time_attn", "space_attn", "ffn")
                      if model.attention_type == "divided_space_time"
                      else ("self_attn", "ffn"))
    # ViViT's tubelet embedding folds tube_size frames into one token step:
    # its blocks see num_frames // tube_size effective frames
    eff_frames = model.num_frames // getattr(model, "tube_size", 1)
    block = BasicTransformerBlock(
        embed_dims=model.embed_dims, num_heads=model.num_heads,
        num_frames=eff_frames,
        hidden_channels=model.embed_dims * 4,
        operator_order=operator_order,
        dpr=0.0, dtype=model.dtype)

    def block_apply(lp, h):
        return block.apply({"params": lp}, h, deterministic)

    tokens, b = model.apply({"params": params}, video,
                            deterministic=deterministic,
                            method="prepare_tokens")
    M = microbatches
    bt = tokens.shape[0]
    assert bt % M == 0, (bt, M)
    mbs = tokens.reshape(M, bt // M, *tokens.shape[1:])

    stacked = stack_block_params(params, model.num_transformer_layers)
    out = pipeline_blocks(block_apply, stacked, mbs, mesh, axis=axis)
    x = out.reshape(bt, *out.shape[2:])

    if model.attention_type == "space_only":
        btot, p_, d_ = x.shape
        x = x.reshape(b, btot // b, p_, d_).mean(axis=1)
    norm = nn.LayerNorm(epsilon=1e-6, dtype=model.dtype)
    x = norm.apply({"params": params["norm"]}, x)
    if model.return_cls_token:
        return x[:, 0]
    return x[:, 1:].mean(axis=1)
