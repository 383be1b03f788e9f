"""MaskFeat HOG-prediction visualization (reference video_transformer.py
visualize branch + its end-to-end visual check at :971-1075).

Decodes a clip, draws a cube mask, runs MaskFeat with ``visualize=True`` and
renders the triplet the reference renders:
  hog_pred.png — per-cell oriented-line plot of the predicted HOG histograms
                 at a mask-cube center frame
  real_img.png — the original (un-normalized) center frame
  mask_img.png — the center frame with masked patches blanked

Usage: python -m videotransformer_tpu.tools.visualize_maskfeat
           [--video CLIP] [--pretrained CKPT] [--output_dir DIR]
"""

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from videotransformer_tpu.data import transforms as T
from videotransformer_tpu.data.mask_generator import (
    CubeMaskGenerator, pad_cube_marker)
from videotransformer_tpu.data.video_reader import DecordInit
from videotransformer_tpu.models.maskfeat import MaskFeat

BUNDLED_DEMO = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "assets", "demo", "checker_spin_0.mp4")


def render_hog(hog_cells: np.ndarray, cell_px: int = 8) -> np.ndarray:
    """Draw each cell's 9-bin orientation histogram as oriented line segments
    (skimage-hog-style visualization). hog_cells: (H, W, 9) -> (H*c, W*c)."""
    gh, gw, n_orient = hog_cells.shape
    img = np.zeros((gh * cell_px, gw * cell_px), np.float32)
    r = cell_px // 2 - 1
    cy, cx = np.mgrid[0:cell_px, 0:cell_px]
    for o in range(n_orient):
        # skimage hog bins span [0, pi); bin centers at (o + .5) * pi / 9
        ang = (o + 0.5) * np.pi / n_orient
        dy, dx = np.sin(ang), np.cos(ang)
        # line mask inside the cell: |perp distance| < 0.7, |along| <= r
        py, px = cy - cell_px / 2 + 0.5, cx - cell_px / 2 + 0.5
        along = py * dy + px * dx
        perp = py * dx - px * dy
        line = ((np.abs(perp) < 0.7) & (np.abs(along) <= r)).astype(np.float32)
        img += np.kron(hog_cells[:, :, o], np.ones((cell_px, cell_px))) * \
            np.tile(line, (gh, gw))
    m = img.max()
    return img / m if m > 0 else img


def run(args):
    num_frames = args.num_frames
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)

    reader = DecordInit()(args.video)
    total = len(reader)
    temporal_sample = T.TemporalRandomCrop(num_frames * args.frame_interval)
    start, end = temporal_sample(total)
    indices = np.linspace(0, max(end - start - 1, 0), num_frames, dtype=int)
    video = reader.get_batch(indices).astype(np.float32)  # (T, H, W, C)
    video = video.transpose(0, 3, 1, 2)

    pre = T.Compose([T.Resize(scale_range=(-1, int(args.image_size * 1.15))),
                     T.CenterCrop(args.image_size)])
    pre.randomize_parameters()
    video = pre(video)  # (T, C, H, W) un-normalized 0..255
    unnorm = video.copy()
    post = T.Compose([T.ToTensor(), T.Normalize(list(mean), list(std))])
    post.randomize_parameters()
    norm_video = post(video)

    grid = args.image_size // 16  # patch(4) x pooling(4) = 16 px per token
    # reference ratio 0.4; at tiny T' int(T' * 0.4) would be 0 cubes
    ratio = 0.4 if num_frames >= 16 else 0.5
    mask_gen = CubeMaskGenerator(
        input_size=(num_frames // 2, grid, grid), mask_ratio=ratio,
        min_num_patches=4)
    mask, cube_marker = mask_gen()
    markers, counts = pad_cube_marker([cube_marker], 8)

    # trainer-config pooling (model_trainer.py:54): 2 Q-pool stages; clip the
    # default dim/head multiplier schedule to the chosen depth (tiny smoke
    # runs use depth 4)
    muls = tuple((i, m) for i, m in ((1, 2.0), (3, 2.0), (14, 2.0))
                 if i < args.depth)
    model = MaskFeat(img_size=args.image_size, num_frames=num_frames,
                     pool_q_stride_size=((1, 1, 2, 2), (3, 1, 2, 2)),
                     embed_dim_mul=muls, atten_head_mul=muls,
                     feature_dim=2 * 2 * 2 * 3 * 9, depth=args.depth,
                     patch_embed_dim=args.patch_embed_dim)

    from videotransformer_tpu.data.hog import batched_hog_targets

    frames_hw = jnp.asarray(unnorm.transpose(0, 2, 3, 1))[None]  # (1,T,H,W,C)
    target = np.zeros(
        (1, num_frames, grid, grid, 108), np.float32)
    centers = [s * 2 + span * 2 // 2 for s, span in cube_marker]
    hog_all = np.asarray(batched_hog_targets(frames_hw[:, centers]))
    for i, c in enumerate(centers):
        target[0, c] = hog_all[0, i]

    x = jnp.asarray(norm_video)[None]
    init_args = dict(mask=jnp.asarray(mask[None].astype(np.int32)),
                     cube_marker=jnp.asarray(markers),
                     cube_count=jnp.asarray(counts))
    params = jax.jit(
        lambda k, v: model.init(k, v, target_x=None, **init_args)
    )(jax.random.PRNGKey(0), x)["params"]
    if args.pretrained:
        from videotransformer_tpu.models.convert import (
            init_maskfeat_from_kinetics_pretrain)

        params = init_maskfeat_from_kinetics_pretrain(params, args.pretrained)

    preds, loss, mask16, hog_preds = model.apply(
        {"params": params}, x, jnp.asarray(target), visualize=True, **init_args)
    print(f"loss={float(loss):.4f} hog_preds={hog_preds.shape}")

    center = centers[0]
    os.makedirs(args.output_dir, exist_ok=True)
    from PIL import Image

    # (1) predicted HOG map at the center frame (channel-summed)
    hp = np.asarray(hog_preds)[0, center].sum(axis=-2)  # (2g, 2g, 9)
    hog_img = render_hog(hp, cell_px=args.image_size // (2 * grid))
    Image.fromarray((hog_img * 255).astype(np.uint8)).save(
        os.path.join(args.output_dir, "hog_pred.png"))

    # (2) the original center frame
    real = unnorm[center].transpose(1, 2, 0).astype(np.uint8)
    Image.fromarray(real).save(os.path.join(args.output_dir, "real_img.png"))

    # (3) the masked center frame (mask16 upsampled to pixels, blanked)
    m = np.asarray(mask16)[0, center]
    px = args.image_size // grid
    m_up = np.kron(m, np.ones((px, px)))[..., None]
    masked = (real * (1 - m_up)).astype(np.uint8)
    Image.fromarray(masked).save(os.path.join(args.output_dir, "mask_img.png"))
    print(f"saved hog_pred/real_img/mask_img to {args.output_dir}")


def main():
    p = argparse.ArgumentParser("MaskFeat HOG-prediction visualization")
    p.add_argument("--video", default=BUNDLED_DEMO)
    p.add_argument("--pretrained", default="", type=str)
    p.add_argument("--output_dir", default="./maskfeat_vis")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--frame_interval", type=int, default=2)
    p.add_argument("--depth", type=int, default=16)
    p.add_argument("--patch_embed_dim", type=int, default=96)
    run(p.parse_args())


if __name__ == "__main__":
    main()
