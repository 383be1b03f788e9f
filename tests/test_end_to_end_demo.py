"""End-to-end demo-clip parity (the BASELINE.json acceptance config).

Decodes the bundled demo mp4, runs the full eval pipeline
(Resize(-1,256) + ThreeCrop(224) + Normalize) and TimeSformer-B through BOTH
frameworks with identical weights, and checks crop-averaged logits and top-1
to fp32 tolerance. This is SURVEY §7 stage 2's "minimum end-to-end slice".
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # heavy compiles / full-scale / multi-process

DEMO_MP4 = "/root/reference/demo/YABnJL_bDzw.mp4"


@pytest.mark.skipif(not os.path.exists(DEMO_MP4), reason="demo clip not present")
def test_demo_clip_logit_parity():
    import video_transformer as ref_vt
    from transformer import ClassificationHead as RefHead

    from videotransformer_tpu.models import TimeSformer
    from videotransformer_tpu.ops.blocks import ClassificationHead
    from videotransformer_tpu.tools.demo_inference import load_clip
    from parity_utils import torch_state_to_flax, assert_close

    num_frames, num_class = 8, 400
    clip = load_clip(DEMO_MP4, num_frames, 32, (0.45,) * 3, (0.225,) * 3)
    assert clip.shape == (3, num_frames, 3, 224, 224)

    # small-but-real config keeps the torch CPU reference fast; full B/16 is
    # covered by test_models_parity + the TPU bench
    torch.manual_seed(0)
    tmod = ref_vt.TimeSformer(
        num_frames=num_frames, img_size=224, patch_size=16, embed_dims=64,
        num_heads=4, num_transformer_layers=2,
        attention_type="divided_space_time").eval()
    thead = RefHead(num_class, 64).eval()

    fmod = TimeSformer(num_frames=num_frames, img_size=224, patch_size=16,
                       embed_dims=64, num_heads=4, num_transformer_layers=2,
                       attention_type="divided_space_time")
    fhead = ClassificationHead(num_class, 64)

    x = jnp.asarray(clip)
    params = fmod.init(jax.random.PRNGKey(0), x)["params"]
    params = torch_state_to_flax(tmod, params)
    head_params = fhead.init(jax.random.PRNGKey(1), jnp.zeros((1, 64)))["params"]
    head_params = torch_state_to_flax(thead, head_params)

    feats = fmod.apply({"params": params}, x)
    logits_j = fhead.apply({"params": head_params}, feats)
    logits_j = np.asarray(logits_j).reshape(3, num_class).mean(0)

    with torch.no_grad():
        feats_t = tmod(torch.from_numpy(np.asarray(clip)))
        logits_t = thead(feats_t).view(3, num_class).mean(0).numpy()

    assert_close(logits_j, logits_t, rtol=1e-4, atol=1e-4, msg="demo logits")
    assert int(np.argmax(logits_j)) == int(np.argmax(logits_t))
