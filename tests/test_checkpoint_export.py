"""flax -> torch checkpoint export (the inverse of the import surgery).

The reference ecosystem only loads checkpoints (weight_init.py); export makes
our training output loadable by the original PyTorch implementation for
cross-validation. Tests: exact state-dict round-trips both directions, the
reference torch model running OUR exported weights with identical logits, and
the full flax -> .pth -> flax cycle through the kinetics import path.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

import video_transformer as ref_vt

from videotransformer_tpu.models import TimeSformer, ViViT
from videotransformer_tpu.models.convert import (
    flax_to_torch_state_dict, init_from_kinetics_pretrain, merge_params,
    save_torch_checkpoint, torch_to_flax_params)
from parity_utils import assert_close

SMALL = dict(img_size=32, patch_size=16, embed_dims=32, num_heads=4,
             num_transformer_layers=2)


def test_statedict_roundtrip_timesformer():
    """torch sd -> flax tree -> torch sd is the identity (keys and values)."""
    torch.manual_seed(0)
    tmod = ref_vt.TimeSformer(num_frames=2, attention_type="divided_space_time",
                              **SMALL).eval()
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    back = flax_to_torch_state_dict(torch_to_flax_params(sd))
    assert set(back) == set(sd), (set(sd) - set(back), set(back) - set(sd))
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_statedict_roundtrip_vivit_fact_encoder():
    torch.manual_seed(1)
    tmod = ref_vt.ViViT(num_frames=4, attention_type="fact_encoder",
                        num_time_transformer_layers=1, **SMALL).eval()
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    back = flax_to_torch_state_dict(
        torch_to_flax_params(sd, "fact_encoder"), "fact_encoder")
    assert set(back) == set(sd), (set(sd) - set(back), set(back) - set(sd))
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_reference_model_runs_exported_weights():
    """Export a freshly-initialized flax model; the reference torch model must
    load it strict=True and produce identical logits."""
    T = 2
    x = np.random.RandomState(0).randn(2, T, 3, 32, 32).astype(np.float32)
    fmod = TimeSformer(num_frames=T, attention_type="divided_space_time", **SMALL)
    params = fmod.init(jax.random.PRNGKey(7), jnp.asarray(x))["params"]

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flax_to_torch_state_dict(params).items()}
    torch.manual_seed(0)
    tmod = ref_vt.TimeSformer(num_frames=T, attention_type="divided_space_time",
                              **SMALL).eval()
    missing, unexpected = tmod.load_state_dict(sd, strict=True), None
    out_j = fmod.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(x))
    assert_close(out_j, out_t, rtol=1e-4, atol=1e-4, msg="exported weights")


def test_two_way_checkpoint_cycle(tmp_path):
    """flax params -> save_torch_checkpoint -> .pth -> kinetics import -> flax:
    logits identical after the full cycle."""
    T = 2
    x = np.random.RandomState(5).randn(1, T, 3, 32, 32).astype(np.float32)
    fmod = TimeSformer(num_frames=T, **SMALL)
    params = fmod.init(jax.random.PRNGKey(3), jnp.asarray(x))["params"]
    path = str(tmp_path / "exported.pth")
    save_torch_checkpoint(params, path)

    params2 = fmod.init(jax.random.PRNGKey(11), jnp.asarray(x))["params"]
    params2 = init_from_kinetics_pretrain(params2, path, verbose=False)
    out_a = fmod.apply({"params": params}, jnp.asarray(x))
    out_b = fmod.apply({"params": params2}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-6, atol=1e-6)
