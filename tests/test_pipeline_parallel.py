"""Pipeline parallelism (parallel/pp.py): the GPipe schedule over a 'pipe'
mesh axis must be numerically identical to running the block stack
sequentially — forward AND backward (microbatch gradient accumulation) —
with the per-stage parameters physically sharded."""

import pytest

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from videotransformer_tpu.models import TimeSformer
from videotransformer_tpu.parallel import pp

pytestmark = pytest.mark.slow  # heavy compiles / full-scale / multi-process


def _pipe_mesh(p=4):
    return Mesh(np.asarray(jax.devices()[:p]), ("pipe",))


def _model(layers=4, dpr=0.0):
    return TimeSformer(num_frames=2, img_size=32, patch_size=16,
                       embed_dims=32, num_heads=4,
                       num_transformer_layers=layers, drop_path_rate=dpr,
                       attention_type="divided_space_time")


def test_stack_unstack_roundtrip():
    model = _model()
    video = jnp.zeros((2, 2, 3, 32, 32), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), video)["params"]
    stacked = pp.stack_block_params(params, 4)
    back = pp.unstack_block_params(stacked, 4)
    for i in range(4):
        a = jax.tree.leaves(params["transformer_layers"][f"layers_{i}"])
        b = jax.tree.leaves(back[f"layers_{i}"])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pipeline_forward_matches_sequential():
    """pp4, 2 microbatches: pipelined features == plain model forward."""
    model = _model(dpr=0.1)  # deterministic forward: DropPath inactive
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(4, 2, 3, 32, 32), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), video)["params"]

    ref = jax.jit(lambda p, v: model.apply({"params": p}, v))(params, video)

    mesh = _pipe_mesh(4)
    out = pipelined = pp.pipelined_forward_features(
        model, params, video, mesh, microbatches=2)
    np.testing.assert_allclose(np.asarray(pipelined), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
    assert out.shape == ref.shape


def test_pipeline_params_physically_sharded():
    model = _model()
    video = jnp.zeros((2, 2, 3, 32, 32), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), video)["params"]
    mesh = _pipe_mesh(4)
    stacked = pp.shard_stacked_params(mesh, pp.stack_block_params(params, 4))
    leaf = jax.tree.leaves(stacked)[0]
    assert "pipe" in str(leaf.sharding.spec), leaf.sharding
    # each device holds exactly 1 of the 4 layers
    shard = leaf.addressable_shards[0]
    assert shard.data.shape[0] == 1, shard.data.shape


def test_pipeline_gradients_match_sequential():
    """Backward through the rotating schedule: d(loss)/d(stacked params) and
    d(loss)/d(tokens) equal the sequential stack's gradients — GPipe
    microbatch gradient accumulation falls out of jax.grad."""
    from videotransformer_tpu.ops.blocks import BasicTransformerBlock

    L, P, M = 4, 4, 2
    model = _model(layers=L, dpr=0.0)
    rng = np.random.RandomState(1)
    video = jnp.asarray(rng.rand(4, 2, 3, 32, 32), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), video)["params"]
    tokens, _ = model.apply({"params": params}, video,
                            method="prepare_tokens")
    mbs = tokens.reshape(M, tokens.shape[0] // M, *tokens.shape[1:])
    stacked = pp.stack_block_params(params, L)

    block = BasicTransformerBlock(
        embed_dims=32, num_heads=4, num_frames=2,
        hidden_channels=128, operator_order=("time_attn", "space_attn", "ffn"),
        dpr=0.0)

    def block_apply(lp, h):
        return block.apply({"params": lp}, h, True)

    mesh = _pipe_mesh(P)

    def loss_pp(sp, xs):
        return (pp.pipeline_blocks(block_apply, sp, xs, mesh) ** 2).sum()

    def loss_seq(sp, xs):
        def layer(h, lp):
            return block_apply(lp, h), None

        flat = xs.reshape(-1, *xs.shape[2:])
        out, _ = jax.lax.scan(layer, flat, sp)
        return (out ** 2).sum()

    g_pp = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(stacked, mbs)
    g_seq = jax.jit(jax.grad(loss_seq, argnums=(0, 1)))(stacked, mbs)
    for a, b in zip(jax.tree.leaves(g_pp[0]), jax.tree.leaves(g_seq[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_pp[1]).reshape(-1),
        np.asarray(g_seq[1]).reshape(-1), rtol=1e-4, atol=1e-6)


def test_pipeline_vivit_divided_matches_sequential():
    """ViViT's tubelet embedding halves the effective frame count the blocks
    see (eff_frames = num_frames // tube_size); the pipeline block must be
    built with THAT, not num_frames — a mismatch reshapes to a valid-but-
    wrong temporal layout and diverges silently."""
    from videotransformer_tpu.models import ViViT

    model = ViViT(num_frames=4, img_size=32, patch_size=16, tube_size=2,
                  embed_dims=32, num_heads=4, num_transformer_layers=4,
                  attention_type="divided_space_time", drop_path_rate=0.0)
    rng = np.random.RandomState(3)
    video = jnp.asarray(rng.rand(4, 4, 3, 32, 32), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), video)["params"]
    ref = jax.jit(lambda p, v: model.apply({"params": p}, v))(params, video)
    out = pp.pipelined_forward_features(
        model, params, video, _pipe_mesh(4), microbatches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_pipeline_composes_with_data_parallel():
    """dp2 x pp4 (8 devices): each data column pipelines its own batch
    shard; output equals the plain forward."""
    model = _model()
    rng = np.random.RandomState(2)
    video = jnp.asarray(rng.rand(4, 2, 3, 32, 32), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), video)["params"]
    ref = jax.jit(lambda p, v: model.apply({"params": p}, v))(params, video)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("pipe", "data"))
    out = pp.pipelined_forward_features(
        model, params, video, mesh, microbatches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
