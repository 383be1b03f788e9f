"""MAE-pretrain checkpoint surgery goldens (VERDICT r4 missing #2).

Runs a synthetic full-geometry (B/16: 768 dims, 12 layers) MAE checkpoint —
MAE key naming: ``encoder.blocks.*``, separate ``attn.q_bias``/``attn.v_bias``
with no k bias, ``mlp.fc1/fc2``, ``{'model': ...}`` wrapper, decoder keys to
drop — through the reference's own ``init_from_mae_pretrain_``
(weight_init.py:187-302) on a real torch model AND through our
``convert.init_from_mae_pretrain``, then compares every checkpoint-derived
leaf.

Documented deliberate divergence: the reference left its qkv/proj key
renames commented out (weight_init.py:244-247, 258-261 — they still target
the retired ``in_proj_``/``out_proj`` module naming), so its
``load_state_dict(strict=False)`` silently DROPS every ``attn.qkv.weight``
and ``attn.proj.{weight,bias}`` — an MAE init that loads layer norms, the
q/zero/v bias concat, and FFNs, but leaves all attention weights at random
init. Our surgery implements the commented-out intent (the same rename the
ViT path performs, weight_init.py:147-150), so those leaves are asserted
against the checkpoint bytes directly, and we additionally assert the
reference really did drop them (if a fixed upstream ever loads them, this
test flags the divergence for re-review).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import video_transformer as ref_vt
import weight_init as ref_wi

from videotransformer_tpu.models import TimeSformer, ViViT
from videotransformer_tpu.models.convert import (
    init_from_mae_pretrain, load_torch_state_dict, surgery_from_mae_pretrain,
    torch_to_flax_params)

EMBED, LAYERS = 768, 12  # ViT-B/16

# leaves our surgery loads from the checkpoint but the reference drops
# (flax-path tails, post torch_to_flax_params)
DIVERGED_TAILS = {
    ("attn", "qkv", "kernel"),
    ("attn", "proj", "kernel"),
    ("attn", "proj", "bias"),
}


def _mae_ckpt(tmp_path, layers=LAYERS, embed=EMBED):
    """Synthetic MAE checkpoint at full geometry in the key naming
    init_from_mae_pretrain_ expects (VideoMAE-style encoder + decoder)."""
    g = torch.Generator().manual_seed(7)

    def r(*shape, s=0.02):
        return torch.randn(*shape, generator=g) * s

    sd = {
        "encoder.patch_embed.proj.weight": r(embed, 3, 16, 16),
        "encoder.patch_embed.proj.bias": r(embed),
        "encoder.norm.weight": 1.0 + r(embed),
        "encoder.norm.bias": r(embed),
        # decoder params the surgery must drop (weight_init.py:208-211)
        "decoder.blocks.0.attn.qkv.weight": r(3 * embed, embed),
        "decoder.norm.weight": 1.0 + r(embed),
        "decoder_pred.weight": r(1536, embed),
    }
    for i in range(layers):
        b = f"encoder.blocks.{i}"
        sd[f"{b}.norm1.weight"] = 1.0 + r(embed)
        sd[f"{b}.norm1.bias"] = r(embed)
        sd[f"{b}.attn.qkv.weight"] = r(3 * embed, embed)
        sd[f"{b}.attn.q_bias"] = r(embed)
        sd[f"{b}.attn.v_bias"] = r(embed)
        sd[f"{b}.attn.proj.weight"] = r(embed, embed)
        sd[f"{b}.attn.proj.bias"] = r(embed)
        sd[f"{b}.norm2.weight"] = 1.0 + r(embed)
        sd[f"{b}.norm2.bias"] = r(embed)
        sd[f"{b}.mlp.fc1.weight"] = r(4 * embed, embed)
        sd[f"{b}.mlp.fc1.bias"] = r(4 * embed)
        sd[f"{b}.mlp.fc2.weight"] = r(embed, 4 * embed)
        sd[f"{b}.mlp.fc2.bias"] = r(embed)
    path = str(tmp_path / "mae_b16_synthetic.pth")
    torch.save({"model": sd}, path)
    return path


def _walk_compare(imported, merged, ref_tree, seen_diverged, path=()):
    """For every leaf path in `imported` (= the correctly-surgeried ckpt):
    non-diverged leaves must be bit-equal in BOTH frameworks; diverged leaves
    must equal the ckpt in OURS and differ in the reference (dropped)."""
    for k, v in imported.items():
        p = path + (k,)
        if isinstance(v, dict):
            assert k in ref_tree, f"{p} missing in reference tree"
            assert k in merged, f"{p} missing in our merged tree"
            _walk_compare(v, merged[k], ref_tree[k], seen_diverged, p)
            continue
        if k not in ref_tree:
            continue  # leaf the torch model does not have
        ours = np.asarray(merged[k])
        ref = np.asarray(ref_tree[k])
        want = np.asarray(v)
        if ours.shape != want.shape:
            continue  # geometry the model reshapes (none expected here)
        if p[-3:] in DIVERGED_TAILS:
            seen_diverged.add(p)
            np.testing.assert_allclose(
                ours, want, rtol=1e-6, atol=1e-6,
                err_msg=f"{p}: our MAE import must load this leaf")
            assert not np.allclose(ref, want), (
                f"{p}: the reference loaded an attn weight it used to drop "
                "(weight_init.py:244-247 un-commented upstream?) — re-review "
                "the documented divergence")
        else:
            np.testing.assert_allclose(
                ref, want, rtol=1e-6, atol=1e-6,
                err_msg=f"{p}: reference did not load this ckpt leaf")
            np.testing.assert_allclose(
                ours, want, rtol=1e-6, atol=1e-6,
                err_msg=f"{p}: our import diverges from the ckpt leaf")


@pytest.mark.parametrize("copy_strategy", ["repeat", "set_zero"])
def test_mae_surgery_timesformer_fullscale(tmp_path, copy_strategy):
    """divided_space_time at B/16: q/0/v bias concat (weight_init.py:248-263),
    norm/FFN remaps, spatial->temporal attention copy, decoder drop."""
    ckpt = _mae_ckpt(tmp_path)

    torch.manual_seed(0)
    tmod = ref_vt.TimeSformer(num_frames=8,
                              attention_type="divided_space_time").eval()
    ref_wi.init_from_mae_pretrain_(tmod, ckpt, "Conv2d", "divided_space_time",
                                   copy_strategy)
    ref_tree = torch_to_flax_params(
        {k: v.detach().numpy() for k, v in tmod.state_dict().items()})

    fmod = TimeSformer(num_frames=8, attention_type="divided_space_time")
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(
            lambda k: fmod.init(k, jnp.zeros((1, 8, 3, 224, 224))),
            jax.random.PRNGKey(0))["params"])
    params = init_from_mae_pretrain(
        params, ckpt, "Conv2d", "divided_space_time", copy_strategy,
        verbose=False)

    imported = torch_to_flax_params(surgery_from_mae_pretrain(
        load_torch_state_dict(ckpt), "Conv2d", "divided_space_time",
        copy_strategy))
    seen = set()
    _walk_compare(imported, params, ref_tree, seen)
    # the divergence set is exactly qkv.kernel + proj.{kernel,bias} for both
    # attentions of all 12 layers: 12 * 2 * 3
    assert len(seen) == LAYERS * 2 * 3, sorted(seen)

    # the q/0/v concat itself, against the raw ckpt bytes: k-bias slice zero
    sd = load_torch_state_dict(ckpt)
    got = np.asarray(
        params["transformer_layers"]["layers_0"]["attentions_0"]["attn"]["qkv"]["bias"])
    np.testing.assert_allclose(got[:EMBED], sd["encoder.blocks.0.attn.q_bias"],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(got[EMBED:2 * EMBED], 0.0)
    np.testing.assert_allclose(got[2 * EMBED:], sd["encoder.blocks.0.attn.v_bias"],
                               rtol=1e-6, atol=1e-6)
    # and the reference loads the identical concat (this path is NOT diverged)
    ref_bias = tmod.state_dict()[
        "transformer_layers.layers.0.attentions.0.attn.qkv.bias"].numpy()
    np.testing.assert_allclose(got, ref_bias, rtol=1e-6, atol=1e-6)
    # spatial->temporal copy honored per strategy
    t_bias = np.asarray(
        params["transformer_layers"]["layers_0"]["attentions_1"]["attn"]["qkv"]["bias"])
    if copy_strategy == "repeat":
        np.testing.assert_allclose(t_bias, got, rtol=1e-6, atol=1e-6)
    else:
        np.testing.assert_allclose(t_bias, 0.0)


def test_mae_surgery_vivit_fact_encoder_fullscale(tmp_path):
    """fact_encoder at B/16: Conv2d->Conv3d tubelet inflation (temporal_avg,
    tube 2) under MAE naming + the first-4-spatial->temporal layer copy
    (weight_init.py:276-298)."""
    ckpt = _mae_ckpt(tmp_path)

    torch.manual_seed(0)
    tmod = ref_vt.ViViT(num_frames=16, attention_type="fact_encoder").eval()
    ref_wi.init_from_mae_pretrain_(
        tmod, ckpt, "Conv3d", "fact_encoder", "repeat", "temporal_avg",
        tube_size=2, num_time_transformer_layers=4)
    ref_tree = torch_to_flax_params(
        {k: v.detach().numpy() for k, v in tmod.state_dict().items()},
        "fact_encoder")

    fmod = ViViT(num_frames=16, attention_type="fact_encoder")
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(
            lambda k: fmod.init(k, jnp.zeros((1, 16, 3, 224, 224))),
            jax.random.PRNGKey(0))["params"])
    params = init_from_mae_pretrain(
        params, ckpt, "Conv3d", "fact_encoder", "repeat", "temporal_avg",
        tube_size=2, num_time_transformer_layers=4, verbose=False)

    imported = torch_to_flax_params(surgery_from_mae_pretrain(
        load_torch_state_dict(ckpt), "Conv3d", "fact_encoder", "repeat",
        "temporal_avg", tube_size=2, num_time_transformer_layers=4),
        "fact_encoder")
    seen = set()
    _walk_compare(imported, params, ref_tree, seen)
    # 12 spatial layers + 4 copied temporal layers, 3 diverged leaves each
    # (fact_encoder uses joint attention: one attention per layer)
    assert len(seen) == (LAYERS + 4) * 3, sorted(seen)

    # tubelet inflation: kernel = repeat over t / tube_size, (kt,kh,kw,i,o)
    sd = load_torch_state_dict(ckpt)
    w2d = sd["encoder.patch_embed.proj.weight"]  # (o, i, kh, kw)
    got = np.asarray(params["patch_embed"]["projection"]["kernel"])
    want = np.repeat(w2d[:, :, None], 2, axis=2) / 2.0
    np.testing.assert_allclose(got, want.transpose(2, 3, 4, 1, 0),
                               rtol=1e-6, atol=1e-6)
