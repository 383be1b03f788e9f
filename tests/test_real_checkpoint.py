"""Real published-checkpoint import parity — env-var gated (VERDICT r4 #7).

The build host has zero egress, so published TimeSformer/ViViT weights have
never touched the importer; the whole surgery stack is proven against
synthetic full-geometry stand-ins (test_fullscale_parity.py). This test
closes that gap the instant real bytes are available:

    VTT_REAL_CKPT=/path/to/timesformer_k400.pth pytest tests/test_real_checkpoint.py

It loads the checkpoint into BOTH frameworks — the torch reference via its
own weight_init.init_from_kinetics_pretrain_ (reference weight_init.py:305-315)
and ours via models/convert.init_from_kinetics_pretrain — then runs the
bundled demo clip through the full eval pipeline (Resize(-1,256) +
ThreeCrop(224) + Normalize, the notebook config) and asserts crop-averaged
logit parity and top-1 agreement at full B/16 geometry.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full B/16 geometry when enabled

DEMO_MP4 = "/root/reference/demo/YABnJL_bDzw.mp4"
REAL_CKPT = os.environ.get("VTT_REAL_CKPT")


@pytest.mark.skipif(
    not REAL_CKPT,
    reason="no real published checkpoint on this host (zero-egress build "
    "environment, see PARITY.md); set VTT_REAL_CKPT=/path/to/ckpt.pth to "
    "run the full import + demo-clip top-1 parity")
@pytest.mark.skipif(not os.path.exists(DEMO_MP4), reason="demo clip not present")
def test_real_checkpoint_demo_parity():
    import torch

    import jax
    import jax.numpy as jnp

    import video_transformer as ref_vt
    import weight_init as ref_wi
    from transformer import ClassificationHead as RefHead

    from videotransformer_tpu.models import TimeSformer, convert
    from videotransformer_tpu.ops.blocks import ClassificationHead
    from videotransformer_tpu.tools.demo_inference import load_clip
    from parity_utils import assert_close

    num_frames, num_class = 8, 400
    clip = load_clip(DEMO_MP4, num_frames, 32, (0.45,) * 3, (0.225,) * 3)

    # --- torch reference at full B/16, seeded from the real checkpoint
    tmod = ref_vt.TimeSformer(
        num_frames=num_frames, img_size=224, patch_size=16, embed_dims=768,
        num_heads=12, num_transformer_layers=12,
        attention_type="divided_space_time").eval()
    thead = RefHead(num_class, 768).eval()
    ref_wi.init_from_kinetics_pretrain_(tmod, REAL_CKPT)
    # cls-head weights ride in the same checkpoint under 'cls_head.' keys
    sd = torch.load(REAL_CKPT, map_location="cpu")
    sd = sd.get("state_dict", sd)
    head_sd = {k.split("cls_head.")[-1]: v for k, v in sd.items()
               if "cls_head" in k}
    if head_sd:
        thead.load_state_dict(head_sd, strict=False)

    # --- ours, through the production importer
    fmod = TimeSformer(num_frames=num_frames, img_size=224, patch_size=16,
                       embed_dims=768, num_heads=12,
                       num_transformer_layers=12,
                       attention_type="divided_space_time")
    fhead = ClassificationHead(num_class, 768)
    x = jnp.asarray(clip)
    params = jax.eval_shape(
        lambda: fmod.init(jax.random.PRNGKey(0), x))["params"]
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)
    params = convert.init_from_kinetics_pretrain(params, REAL_CKPT)
    head_params = fhead.init(jax.random.PRNGKey(1), jnp.zeros((1, 768)))["params"]
    if head_sd:
        head_params = {"fc": {"kernel": jnp.asarray(head_sd["fc_cls.weight"].numpy().T),
                              "bias": jnp.asarray(head_sd["fc_cls.bias"].numpy())}}

    feats = fmod.apply({"params": params}, x)
    logits_j = np.asarray(
        fhead.apply({"params": head_params}, feats)).reshape(3, num_class).mean(0)

    with torch.no_grad():
        feats_t = tmod(torch.from_numpy(np.asarray(clip)))
        logits_t = thead(feats_t).view(3, num_class).mean(0).numpy()

    assert_close(logits_j, logits_t, rtol=1e-3, atol=1e-3,
                 msg="real-ckpt demo logits")
    assert int(np.argmax(logits_j)) == int(np.argmax(logits_t))
