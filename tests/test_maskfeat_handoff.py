"""MaskFeat pretrain -> mvit supervised finetune handoff.

The reference's headline workflow: ``-arch mvit -objective supervised
-pretrain_pth <maskfeat ckpt>`` builds MaskFeat and loads the pretrained
weights (model_trainer.py:72-77 -> video_transformer.py:866-870 init_weights
-> init_from_kinetics_pretrain_). Round-3 verdict found this unwired here;
these tests cover both halves:

- our own orbax mim checkpoint (a directory) seeds the supervised trainer
  params-only (convert.init_from_orbax_pretrain), bit-equal backbone;
- a reference-named torch .pth MaskFeat checkpoint imports with ZERO missing
  and ZERO unexpected backbone keys (convert.init_maskfeat_from_kinetics_
  pretrain, golden round-trip through convert.save_torch_checkpoint
  arch="mvit").
"""

import os
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

DEMO_MP4 = "/root/reference/demo/YABnJL_bDzw.mp4"


def _tiny_maskfeat_build(configs):
    from videotransformer_tpu.models.maskfeat import MaskFeat

    return MaskFeat(
        img_size=configs.img_size, num_frames=configs.num_frames, depth=4,
        embed_dim_mul=((1, 2.0), (3, 2.0)), atten_head_mul=((1, 2.0), (3, 2.0)),
        pool_q_stride_size=((1, 1, 2, 2), (3, 1, 2, 2)),
        feature_dim=2 * 2 * 2 * 3 * 9)


def _cfg(**over):
    cfg = dict(
        objective="mim", arch="mvit", attention_type="divided_space_time",
        num_class=40, num_frames=4, img_size=64, batch_size=2, num_workers=1,
        optim_type="adamw", lr=8e-4, lr_schedule="cosine", warmup_epochs=1,
        min_lr=1e-6, weight_decay=0.05, weight_decay_end=0.05, clip_grad=0.0,
        seed=0, mixup=False, eval_metrics="finetune", layer_decay=0.75,
    )
    cfg.update(over)
    return SimpleNamespace(**cfg)


def _leaves_equal(a, b):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.slow
@pytest.mark.heavy
def test_orbax_mim_checkpoint_seeds_supervised(tmp_path, monkeypatch):
    from videotransformer_tpu.parallel.mesh import create_mesh, shard_batch
    from videotransformer_tpu.training import trainer as trainer_mod
    from videotransformer_tpu.training.trainer import VideoTransformerTrainer

    monkeypatch.setattr(trainer_mod, "build_model", _tiny_maskfeat_build)
    mesh = create_mesh(devices=jax.devices()[:2])

    mim = VideoTransformerTrainer(_cfg(), ckpt_dir=None, mesh=mesh)
    ckpt = tmp_path / "last_checkpoint"
    mim.save_checkpoint(str(ckpt), block=True)
    mim_params = jax.device_get(mim.params["model"])

    sup = VideoTransformerTrainer(
        _cfg(objective="supervised", pretrain_pth=str(ckpt)),
        ckpt_dir=None, mesh=mesh)
    # every backbone leaf (incl. the frozen decoder_pred and mask_token)
    # bit-equal to the mim run's checkpoint
    _leaves_equal(jax.device_get(sup.params["model"]), mim_params)
    # cls head exists and is freshly initialized (not in the mim ckpt)
    assert "cls_head" in sup.params

    # the seeded trainer takes a supervised step
    rng = np.random.RandomState(0)
    batch = shard_batch(sup.mesh, {
        "video": rng.rand(2, 4, 3, 64, 64).astype(np.float32),
        "label": np.asarray([1, 2], np.int32)})
    key = jax.random.fold_in(sup.base_key, 0)
    sup.params, sup.opt_state, stats = sup._train_step(
        sup.params, sup.opt_state, batch, key,
        jnp.float32(1e-3), jnp.float32(0.05))
    assert np.isfinite(float(stats["loss"]))


def test_torch_maskfeat_ckpt_imports_with_zero_missing_keys(tmp_path):
    """Golden: a reference-named MaskFeat .pth (pytorchvideo naming,
    lightning 'model.' prefixes) imports into the flax MaskFeat with no
    missing and no unexpected backbone keys, values matching exactly."""
    from videotransformer_tpu.models import convert

    model = _tiny_maskfeat_build(_cfg())
    x = jnp.zeros((1, 4, 3, 64, 64))
    grid = 64 // 16
    params = jax.jit(lambda k: model.init(
        k, x, mask=jnp.zeros((1, 2, grid, grid), jnp.int32),
        cube_marker=jnp.zeros((1, 8, 2), jnp.int32),
        cube_count=jnp.zeros((1,), jnp.int32),
        target_x=None))(jax.random.PRNGKey(3))["params"]

    pth = tmp_path / "maskfeat_ref.pth"
    convert.save_torch_checkpoint(params, str(pth), arch="mvit")

    # the exported state dict carries the reference names
    sd = convert.load_torch_state_dict(str(pth))
    assert any(k.startswith("model.patch_embed.patch_model.") for k in sd)
    assert any(".mlp.fc1." in k for k in sd)
    assert any(".attn.pool_q.weight" in k for k in sd)

    # re-init with a different seed so a silent no-op merge would be caught
    params2 = jax.jit(lambda k: model.init(
        k, x, mask=jnp.zeros((1, 2, grid, grid), jnp.int32),
        cube_marker=jnp.zeros((1, 8, 2), jnp.int32),
        cube_count=jnp.zeros((1,), jnp.int32),
        target_x=None))(jax.random.PRNGKey(4))["params"]

    sd2 = convert.replace_state_dict(sd)
    sd2 = convert.surgery_maskfeat_keys(sd2)
    imported = convert.torch_to_flax_params(sd2)
    merged, missing, unexpected = convert.merge_params(params2, imported)
    assert missing == [], missing
    assert unexpected == [], unexpected
    _leaves_equal(merged, params)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(DEMO_MP4), reason="demo clip absent")
@pytest.mark.heavy
def test_cli_mim_pretrain_then_mvit_finetune(tmp_path, monkeypatch):
    """The full reference workflow through the CLI: -objective mim on the
    bundled demo clip, then -arch mvit -objective supervised -pretrain_pth
    <the mim run's last_checkpoint> — imported backbone bit-equal."""
    import glob

    import orbax.checkpoint as ocp

    from videotransformer_tpu.parallel import mesh as mesh_mod
    from videotransformer_tpu.training import trainer as trainer_mod

    monkeypatch.setattr(trainer_mod, "build_model", _tiny_maskfeat_build)
    orig_create = mesh_mod.create_mesh
    monkeypatch.setattr(
        trainer_mod, "create_mesh",
        lambda *a, **k: orig_create(devices=jax.devices()[:1]))

    ann = tmp_path / "ann.txt"
    ann.write_text("".join(f"{DEMO_MP4}\tabseiling\n" for _ in range(4)))

    import model_pretrain

    # num_frames=6 so the cube generator draws at least one marker
    # (num_masking_frames = int(3 * 0.4) = 1); img 64 -> 4x4 mask grid
    argv = [
        "-epoch", "1", "-batch_size", "2", "-num_workers", "1",
        "-num_class", "400", "-num_frames", "6", "-frame_interval", "2",
        "-img_size", "64", "-objective", "mim", "-arch", "mvit",
        "-lr", "8e-4", "-warmup_epochs", "1", "-root_dir", str(tmp_path),
        "-train_data_path", str(ann), "-log_interval", "1",
    ]
    mim_trainer = model_pretrain.single_run(argv)
    assert mim_trainer.global_step == 2
    ckpts = glob.glob(str(tmp_path / "results" / "*" / "ckpt" /
                          "last_checkpoint"))
    assert ckpts, "mim last_checkpoint not written"
    mim_model_params = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(ckpts[0]))["params"]["model"]

    argv_ft = [
        "-epoch", "1", "-batch_size", "2", "-num_workers", "1",
        "-num_class", "400", "-num_frames", "6", "-frame_interval", "2",
        "-img_size", "64", "-objective", "supervised", "-arch", "mvit",
        "-lr", "1e-3", "-warmup_epochs", "1", "-root_dir", str(tmp_path),
        "-train_data_path", str(ann), "-log_interval", "1",
        "-pretrain_pth", ckpts[0],
    ]
    ft_trainer = model_pretrain.single_run(argv_ft)
    assert ft_trainer.global_step == 2
    # the finetune steps have updated the backbone; equality is asserted on
    # the FROZEN decoder_pred (excluded from the optimizer for
    # mvit-supervised, model_trainer.py:78-79) — still bit-equal to the mim
    # checkpoint after training, proving the import ran AND the freeze holds
    _leaves_equal(jax.device_get(ft_trainer.params["model"]["decoder_pred"]),
                  mim_model_params["decoder_pred"])
