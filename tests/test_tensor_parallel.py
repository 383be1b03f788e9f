"""Tensor-parallel shardings: a (data=2, model=2) mesh train step must produce
the same numbers as the replicated-DP baseline, with qkv/ffn params actually
sharded over the model axis."""

from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from videotransformer_tpu.models import TimeSformer
from videotransformer_tpu.parallel.mesh import create_mesh, shard_batch
from videotransformer_tpu.parallel.tp import shard_params_tp, tp_spec
from videotransformer_tpu.training import trainer as trainer_mod
from videotransformer_tpu.training.trainer import VideoTransformerTrainer


def test_tp_spec_rules():
    assert tp_spec(("transformer_layers", "layers_0", "attentions_0", "attn",
                    "qkv", "kernel"), None) == P(None, "model")
    assert tp_spec(("transformer_layers", "layers_0", "attentions_0", "attn",
                    "proj", "kernel"), None) == P("model", None)
    assert tp_spec(("transformer_layers", "layers_0", "ffns_0",
                    "layers_0", "kernel"), None) == P(None, "model")
    assert tp_spec(("transformer_layers", "layers_0", "ffns_0",
                    "layers_1", "kernel"), None) == P("model", None)
    # mvit block residual projection stays replicated
    assert tp_spec(("mvit", "blocks_3", "proj", "kernel"), None) == P()
    # norms / embeddings replicated
    assert tp_spec(("norm", "scale"), None) == P()
    assert tp_spec(("pos_embed",), None) == P()


def _tiny(configs):
    return TimeSformer(
        num_frames=configs.num_frames, img_size=configs.img_size,
        patch_size=16, embed_dims=32, num_heads=4, num_transformer_layers=2,
        attention_type=configs.attention_type)


def _cfg():
    return SimpleNamespace(
        objective="supervised", arch="timesformer",
        attention_type="divided_space_time", num_class=10, num_frames=2,
        img_size=32, batch_size=4, optim_type="adamw", lr=1e-3,
        lr_schedule="cosine", warmup_epochs=1, min_lr=1e-6, weight_decay=0.05,
        weight_decay_end=0.05, clip_grad=1.0, seed=0, mixup=False,
        eval_metrics="finetune", layer_decay=1.0)


@pytest.mark.slow
def test_tp_step_matches_dp(monkeypatch):
    monkeypatch.setattr(trainer_mod, "build_model", _tiny)
    cfg = _cfg()

    rng = np.random.RandomState(0)
    video = rng.rand(4, 2, 3, 32, 32).astype(np.float32)
    labels = (np.arange(4) % 10).astype(np.int32)

    results = {}
    for name, (d, m) in {"dp": (4, 1), "tp": (2, 2)}.items():
        mesh = create_mesh(data=d, model=m, devices=jax.devices()[: d * m])
        tr = VideoTransformerTrainer(cfg, ckpt_dir=None, mesh=mesh)
        if name == "tp":
            # qkv kernel really is sharded over the model axis
            qkv = tr.params["model"]["transformer_layers"]["layers_0"][
                "attentions_0"]["attn"]["qkv"]["kernel"]
            spec = qkv.sharding.spec
            assert "model" in str(spec), spec
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

    assert abs(results["dp"]["loss"] - results["tp"]["loss"]) < 1e-5
    assert abs(results["dp"]["grad_norm"] - results["tp"]["grad_norm"]) < 1e-3
    np.testing.assert_allclose(results["dp"]["qkv"], results["tp"]["qkv"],
                               rtol=1e-4, atol=1e-6)
