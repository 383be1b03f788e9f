"""Sequence-parallel shardings (parallel/sp.py).

Divided space-time attention is naturally sequence-parallel: temporal rows
shard over patches, spatial rows over frames, one all-to-all per transition.
A (data=2, seq=2) mesh train step must produce the same numbers as the
replicated-DP baseline; the shard_map-wrapped Pallas kernels (the path a real
TPU pod executes) are checked in interpret mode on the CPU mesh.
"""

import pytest

from types import SimpleNamespace

import numpy as np

import jax
import jax.numpy as jnp

from videotransformer_tpu.models import TimeSformer
from videotransformer_tpu.parallel import sp as vt_sp
from videotransformer_tpu.parallel.mesh import create_mesh, shard_batch
from videotransformer_tpu.training import trainer as trainer_mod
from videotransformer_tpu.training.trainer import VideoTransformerTrainer

pytestmark = pytest.mark.slow  # heavy compiles / full-scale / multi-process


def _tiny(configs):
    return TimeSformer(
        num_frames=configs.num_frames, img_size=configs.img_size,
        patch_size=16, embed_dims=32, num_heads=4, num_transformer_layers=2,
        attention_type=configs.attention_type)


def _cfg(**over):
    base = dict(
        objective="supervised", arch="timesformer",
        attention_type="divided_space_time", num_class=10, num_frames=2,
        img_size=32, batch_size=4, optim_type="adamw", lr=1e-3,
        lr_schedule="cosine", warmup_epochs=1, min_lr=1e-6, weight_decay=0.05,
        weight_decay_end=0.05, clip_grad=1.0, seed=0, mixup=False,
        eval_metrics="finetune", layer_decay=1.0)
    base.update(over)
    return SimpleNamespace(**base)


def test_sp_step_matches_dp(monkeypatch):
    """dp=2 x sp=2 == dp=4 on the same global batch: loss, grad_norm and the
    updated params must agree (the sp constraints only move data, never
    change the math)."""
    monkeypatch.setattr(trainer_mod, "build_model", _tiny)
    cfg = _cfg()

    rng = np.random.RandomState(0)
    video = rng.rand(4, 2, 3, 32, 32).astype(np.float32)
    labels = (np.arange(4) % 10).astype(np.int32)

    results = {}
    for name, (d, s) in {"dp": (4, 1), "sp": (2, 2)}.items():
        mesh = create_mesh(data=d, seq=s, devices=jax.devices()[: d * s])
        tr = VideoTransformerTrainer(cfg, ckpt_dir=None, mesh=mesh)
        assert vt_sp.active() == (s > 1)
        batch = shard_batch(mesh, {"video": video, "label": labels})
        key = jax.random.PRNGKey(42)
        params, opt_state, stats = tr._train_step(
            tr.params, tr.opt_state, batch, key,
            jnp.float32(1e-3), jnp.float32(0.05))
        results[name] = {
            "loss": float(stats["loss"]),
            "grad_norm": float(stats["grad_norm"]),
            "qkv": np.asarray(jax.device_get(
                params["model"]["transformer_layers"]["layers_0"][
                    "attentions_0"]["attn"]["qkv"]["kernel"])),
        }
    vt_sp.disable_sequence_parallel()
    assert np.isclose(results["sp"]["loss"], results["dp"]["loss"],
                      rtol=1e-5), results
    assert np.isclose(results["sp"]["grad_norm"], results["dp"]["grad_norm"],
                      rtol=1e-4), results
    np.testing.assert_allclose(results["sp"]["qkv"], results["dp"]["qkv"],
                               rtol=1e-4, atol=1e-6)


def _mhsa_args(B, N, D, seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(B, N, D) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(D) * 0.1 + 1, jnp.float32),
        jnp.asarray(rng.randn(D) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(D, 3 * D) * 0.05, jnp.float32),
        jnp.asarray(rng.randn(3 * D) * 0.05, jnp.float32),
        jnp.asarray(rng.randn(D, D) * 0.05, jnp.float32),
        jnp.asarray(rng.randn(D) * 0.05, jnp.float32),
    )


def test_row_sharded_pallas_kernel_matches_reference():
    """The exact code path a TPU pod runs under sp: the fused prenorm-MHSA
    Pallas kernel per device shard via jax.shard_map — forward AND gradient
    (interpret mode on the CPU mesh)."""
    from jax.experimental.pallas import tpu as pltpu

    from videotransformer_tpu.kernels.fused_mhsa_pallas import (
        _reference_jnp, fused_prenorm_mhsa)

    mesh = create_mesh(data=2, seq=2, model=1, devices=jax.devices()[:4])
    B, N, D, H = 8, 16, 32, 4
    args = _mhsa_args(B, N, D)
    scale = (D // H) ** -0.5

    def fn(x, *w):
        return fused_prenorm_mhsa(x, *w, H, scale, 1e-5, True)

    ref = _reference_jnp(*args, num_heads=H, scale=scale, ln_eps=1e-5)
    g_ref = jax.grad(lambda *a: (_reference_jnp(
        *a, num_heads=H, scale=scale, ln_eps=1e-5) ** 2).sum())(*args)

    with vt_sp.sequence_parallel(mesh):
        with pltpu.force_tpu_interpret_mode():
            out = jax.jit(
                lambda x, *w: vt_sp.row_sharded_call(fn, x, *w))(*args)
            g = jax.jit(jax.grad(
                lambda *a: (vt_sp.row_sharded_call(fn, *a) ** 2).sum()))(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=5e-4, atol=5e-5)


def test_token_sharded_ffn_peels_cls_row():
    """token_sharded_call with n = 1 + multiple-of-sp (the TimeSformer cls
    layout): the cls row is peeled and the rest runs per-shard; output must
    equal the plain kernel call."""
    from jax.experimental.pallas import tpu as pltpu

    from videotransformer_tpu.kernels.fused_ffn_pallas import (
        _reference_jnp, fused_prenorm_ffn)

    def head_fn(xx, *w):
        b_, n_, d_ = xx.shape
        return _reference_jnp(
            xx.reshape(b_ * n_, d_), *w, 1e-5).reshape(b_, n_, d_)

    mesh = create_mesh(data=2, seq=2, model=1, devices=jax.devices()[:4])
    rng = np.random.RandomState(3)
    B, N, D = 4, 9, 32  # N = 1 + 8, 8 % sp == 0
    x = jnp.asarray(rng.randn(B, N, D) * 0.1, jnp.float32)
    w = (jnp.asarray(rng.randn(D) * 0.1 + 1, jnp.float32),
         jnp.asarray(rng.randn(D) * 0.1, jnp.float32),
         jnp.asarray(rng.randn(D, 4 * D) * 0.05, jnp.float32),
         jnp.asarray(rng.randn(4 * D) * 0.05, jnp.float32),
         jnp.asarray(rng.randn(4 * D, D) * 0.05, jnp.float32),
         jnp.asarray(rng.randn(D) * 0.05, jnp.float32))

    with pltpu.force_tpu_interpret_mode():
        ref = fused_prenorm_ffn(x, *w)
        with vt_sp.sequence_parallel(mesh):
            out = jax.jit(lambda xx, *ww: vt_sp.token_sharded_call(
                fused_prenorm_ffn, xx, *ww, head_fn=head_fn))(x, *w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_sp_full_model_fused_path_matches_unfused():
    """End to end: tiny TimeSformer forward with sp active and the PALLAS
    backend (interpret mode) — packed temporal attention derives its pack
    group from the LOCAL shard row count — must match the plain XLA forward
    with sp off."""
    from jax.experimental.pallas import tpu as pltpu

    from videotransformer_tpu import config as vt_config

    model = TimeSformer(num_frames=2, img_size=32, patch_size=16,
                        embed_dims=32, num_heads=4, num_transformer_layers=2,
                        attention_type="divided_space_time")
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(4, 2, 3, 32, 32), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), video)["params"]

    ref = jax.jit(lambda p, v: model.apply({"params": p}, v))(params, video)

    mesh = create_mesh(data=2, seq=2, model=1, devices=jax.devices()[:4])
    vt_config.set_attention_backend("pallas")
    try:
        with vt_sp.sequence_parallel(mesh):
            with pltpu.force_tpu_interpret_mode():
                out = jax.jit(
                    lambda p, v: model.apply({"params": p}, v))(params, video)
    finally:
        vt_config.set_attention_backend("auto")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-5)


def test_constrain_rows_inactive_is_identity():
    x = jnp.ones((6, 4, 8))
    assert vt_sp.constrain_rows(x) is x
    assert vt_sp.token_sharded_call(lambda y: y * 2, x).shape == x.shape
    assert not vt_sp.active()
