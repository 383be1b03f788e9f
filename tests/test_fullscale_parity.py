"""Full-scale (B/16: 768 dims, 12 heads, 12 layers, 196+1 pos embed) golden
parity — both import and export directions (VERDICT r2 missing #1).

The small-shape goldens can't catch geometry-dependent bugs (pos-emb
interpolation at 14x14, qkv concat at 3x768, 12-block DropPath linspace,
Conv3d tubelet inflation at real dims, 16-block MViT layer decay). These
tests run the REAL reference surgery (`weight_init.init_from_vit_pretrain_`,
weight_init.py:106-184) on a synthetic full-geometry ViT-B checkpoint, run
OUR surgery on the same file, and assert leaf-exact agreement plus end-to-end
logit parity on the bundled demo clip at fp32 tolerance. No published .pth is
fetchable in this environment (zero egress — see PARITY.md), so the synthetic
full-geometry checkpoint is the stand-in the round-2 review prescribed.

Slow by design (full-size torch + eager flax forwards on CPU).
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import video_transformer as ref_vt
import weight_init as ref_wi

from videotransformer_tpu.models import TimeSformer, ViViT
from videotransformer_tpu.models.convert import (
    flax_to_torch_state_dict, init_from_vit_pretrain)
from parity_utils import torch_state_to_flax, assert_close
from test_checkpoint_surgery import _assert_imported_leaves_equal

pytestmark = pytest.mark.slow  # heavy compiles / full-scale / multi-process

DEMO_MP4 = "/root/reference/demo/YABnJL_bDzw.mp4"

EMBED, LAYERS, HEADS, PATCHES = 768, 12, 12, 196  # ViT-B/16 @ 224^2


def _fullscale_vit_ckpt(tmp_path):
    """Synthetic ViT-B/16 checkpoint at the real geometry, in the key naming
    `init_from_vit_pretrain_` expects (in_proj_/out_proj/norms.{0,1} — the
    published ViT-21k layout, weight_init.py:141-155). Magnitudes follow the
    usual trunc-normal(0.02)/LN(1,0) init so the 12-layer forward stays
    numerically tame."""
    g = torch.Generator().manual_seed(42)

    def r(*shape, s=0.02):
        return torch.randn(*shape, generator=g) * s

    sd = {
        "cls_token": r(1, 1, EMBED),
        "pos_embed": r(1, PATCHES + 1, EMBED),
        "patch_embed.projection.weight": r(EMBED, 3, 16, 16),
        "patch_embed.projection.bias": r(EMBED),
        "norm.weight": 1.0 + r(EMBED),
        "norm.bias": r(EMBED),
    }
    for i in range(LAYERS):
        base = f"transformer_layers.layers.{i}"
        sd[f"{base}.norms.0.weight"] = 1.0 + r(EMBED)
        sd[f"{base}.norms.0.bias"] = r(EMBED)
        sd[f"{base}.norms.1.weight"] = 1.0 + r(EMBED)
        sd[f"{base}.norms.1.bias"] = r(EMBED)
        sd[f"{base}.attentions.0.attn.in_proj_weight"] = r(3 * EMBED, EMBED)
        sd[f"{base}.attentions.0.attn.in_proj_bias"] = r(3 * EMBED)
        sd[f"{base}.attentions.0.attn.out_proj.weight"] = r(EMBED, EMBED)
        sd[f"{base}.attentions.0.attn.out_proj.bias"] = r(EMBED)
        sd[f"{base}.ffns.0.layers.0.0.weight"] = r(4 * EMBED, EMBED)
        sd[f"{base}.ffns.0.layers.0.0.bias"] = r(4 * EMBED)
        sd[f"{base}.ffns.0.layers.1.weight"] = r(EMBED, 4 * EMBED)
        sd[f"{base}.ffns.0.layers.1.bias"] = r(EMBED)
    path = str(tmp_path / "vit_b16_synthetic.pth")
    torch.save({"state_dict": sd}, path)
    return path


def _demo_center_crop(num_frames):
    """One center 224-crop of the demo clip through the host eval transform."""
    from videotransformer_tpu.tools.demo_inference import load_clip

    clip = load_clip(DEMO_MP4, num_frames, 32, (0.45,) * 3, (0.225,) * 3)
    assert clip.shape == (3, num_frames, 3, 224, 224)
    return clip[2:3]  # ThreeCrop order: left, right, center


@pytest.mark.skipif(not os.path.exists(DEMO_MP4), reason="demo clip not present")
def test_timesformer_b_fullscale_import_export_forward(tmp_path):
    """TimeSformer-B (video_transformer.py:263-268 geometry): reference
    surgery vs ours leaf-exact at 768x12, then logit parity on a demo clip,
    then our full-scale export strict-loads into a fresh reference model."""
    ckpt = _fullscale_vit_ckpt(tmp_path)
    num_frames = 8

    torch.manual_seed(0)
    tmod = ref_vt.TimeSformer(num_frames=num_frames,
                              attention_type="divided_space_time").eval()
    ref_wi.init_from_vit_pretrain_(tmod, ckpt, "Conv2d", "divided_space_time",
                                   "repeat")

    fmod = TimeSformer(num_frames=num_frames,
                       attention_type="divided_space_time")
    x = jnp.asarray(_demo_center_crop(num_frames))
    params = fmod.init(jax.random.PRNGKey(0), x)["params"]
    params = init_from_vit_pretrain(
        params, ckpt, "Conv2d", "divided_space_time", "repeat", verbose=False)

    # every ckpt-derived leaf must equal the reference post-surgery weight
    from videotransformer_tpu.models.convert import (
        load_torch_state_dict, surgery_from_vit_pretrain, torch_to_flax_params)

    sd = surgery_from_vit_pretrain(
        load_torch_state_dict(ckpt), "Conv2d", "divided_space_time", "repeat")
    imported = torch_to_flax_params(sd)
    ref_tree = torch_to_flax_params(
        {k: v.detach().numpy() for k, v in tmod.state_dict().items()})
    _assert_imported_leaves_equal(imported, params, ref_tree,
                                  msg="fullscale vit import")

    # sync the not-in-ckpt leaves (time_embed) and compare forwards
    params = torch_state_to_flax(tmod, params)
    out_j = fmod.apply({"params": params}, x)
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(np.asarray(x)))
    assert_close(out_j, out_t, rtol=1e-3, atol=1e-4,
                 msg="fullscale timesformer forward")

    # export direction at full geometry: strict torch load + identical output
    sd_out = {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in flax_to_torch_state_dict(params).items()}
    torch.manual_seed(1)
    tmod2 = ref_vt.TimeSformer(num_frames=num_frames,
                               attention_type="divided_space_time").eval()
    tmod2.load_state_dict(sd_out, strict=True)
    with torch.no_grad():
        out_t2 = tmod2(torch.from_numpy(np.asarray(x)))
    np.testing.assert_allclose(out_t2.numpy(), out_t.numpy(),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.skipif(not os.path.exists(DEMO_MP4), reason="demo clip not present")
def test_vivit_b_fullscale_fact_encoder_import_export_forward(tmp_path):
    """ViViT-B fact_encoder at real dims: Conv2d->Conv3d tubelet inflation
    (temporal_avg, tube_size=2), 12-layer spatial + 4-layer temporal container
    remap and spatial->temporal layer copy (weight_init.py:127-179), logit
    parity on the demo clip, and full-scale export."""
    ckpt = _fullscale_vit_ckpt(tmp_path)
    num_frames = 16

    torch.manual_seed(0)
    tmod = ref_vt.ViViT(num_frames=num_frames,
                        attention_type="fact_encoder").eval()
    ref_wi.init_from_vit_pretrain_(
        tmod, ckpt, "Conv3d", "fact_encoder", "repeat", "temporal_avg",
        tube_size=2, num_time_transformer_layers=4)

    fmod = ViViT(num_frames=num_frames, attention_type="fact_encoder")
    x = jnp.asarray(_demo_center_crop(num_frames))
    params = fmod.init(jax.random.PRNGKey(0), x)["params"]
    params = init_from_vit_pretrain(
        params, ckpt, "Conv3d", "fact_encoder", "repeat", "temporal_avg",
        tube_size=2, num_time_transformer_layers=4, verbose=False)

    from videotransformer_tpu.models.convert import (
        load_torch_state_dict, surgery_from_vit_pretrain, torch_to_flax_params)

    sd = surgery_from_vit_pretrain(
        load_torch_state_dict(ckpt), "Conv3d", "fact_encoder", "repeat",
        "temporal_avg", tube_size=2, num_time_transformer_layers=4)
    imported = torch_to_flax_params(sd, "fact_encoder")
    ref_tree = torch_to_flax_params(
        {k: v.detach().numpy() for k, v in tmod.state_dict().items()},
        "fact_encoder")
    _assert_imported_leaves_equal(imported, params, ref_tree,
                                  msg="fullscale vivit import")

    params = torch_state_to_flax(tmod, params, "fact_encoder")
    out_j = fmod.apply({"params": params}, x)
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(np.asarray(x)))
    assert_close(out_j, out_t, rtol=1e-3, atol=1e-4,
                 msg="fullscale vivit forward")

    sd_out = {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in flax_to_torch_state_dict(
                  params, "fact_encoder").items()}
    torch.manual_seed(1)
    tmod2 = ref_vt.ViViT(num_frames=num_frames,
                         attention_type="fact_encoder").eval()
    tmod2.load_state_dict(sd_out, strict=True)
    with torch.no_grad():
        out_t2 = tmod2(torch.from_numpy(np.asarray(x)))
    np.testing.assert_allclose(out_t2.numpy(), out_t.numpy(),
                               rtol=1e-6, atol=1e-6)


def test_mvit_fullscale_layer_decay_ids_match_reference():
    """MViT-B trainer-config layer decay over the REAL 16-block tree: our
    flax-path layer ids must equal reference get_mvit_layer
    (optimizer.py:100-111) on the equivalent torch names, for every param in
    the full-geometry MaskFeat model (18 layer ids)."""
    import optimizer as ref_opt

    from videotransformer_tpu.models.maskfeat import MaskFeat
    from videotransformer_tpu.training.optimizer import mvit_layer_id

    model = MaskFeat(num_frames=16, img_size=224,
                     pool_q_stride_size=((1, 1, 2, 2), (3, 1, 2, 2)),
                     feature_dim=216)
    # full-geometry param tree without running the forward (eval_shape)
    dummy = jnp.zeros((1, 16, 3, 224, 224), jnp.float32)
    mask = jnp.zeros((1, 8, 14, 14), jnp.int32)
    marker = jnp.zeros((1, 8, 2), jnp.int32)
    count = jnp.zeros((1,), jnp.int32)
    tree = jax.eval_shape(
        lambda k: model.init(k, dummy, None, mask=mask, cube_marker=marker,
                             cube_count=count),
        jax.random.PRNGKey(0))["params"]

    paths = [
        "/".join(str(k.key) for k in p)
        for p, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
    ]
    assert len(paths) > 200  # the real 16-block tree, not a stub
    stripped = [p[len("mvit/"):] if p.startswith("mvit/") else p for p in paths]
    n_blocks = len({p.split("/")[0] for p in stripped if p.startswith("blocks_")})
    assert n_blocks == 16

    seen_ids = set()
    for p, sp in zip(paths, stripped):
        # flax path -> reference torch name shape
        # (mvit/blocks_3/... -> mvit.blocks.3...)
        name = sp.replace("/", ".")
        if name.startswith("blocks_"):
            name = "blocks." + name[len("blocks_"):]
        if p.startswith("mvit/"):
            name = "mvit." + name
        ours = mvit_layer_id(p, num_layers=18)
        ref = ref_opt.get_mvit_layer(name, 18)
        assert ours == ref, (p, name, ours, ref)
        seen_ids.add(ours)
    # the full schedule: embeddings at 0, blocks 1..16, the rest at 17
    assert seen_ids == set(range(18)), sorted(seen_ids)
