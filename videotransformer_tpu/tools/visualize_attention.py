"""Attention-rollout visualization (DINO-style), TPU-native.

Re-design of reference visualize_attention.py:179-256: build TimeSformer-B
8x224, optionally load a Kinetics checkpoint, decode a clip, take the last
block's self-attention via ``get_last_selfattention`` (for divided space-time
attention this is the SPATIAL attention of the final block, shaped
(T, heads, 197, 197) — transformer.py:625-636), then per frame and per head:

- cls-token attention over the 196 patches -> (14, 14) heatmap,
- mass-threshold binarized mask keeping ``threshold`` of the attention mass
  (visualize_attention.py:66-102), nearest-upsampled by patch_size,
- colored overlay compositing over a dimmed grayscale frame
  (visualize_attention.py:104-177),
- saves ``attn_img{i}.png`` per frame: [frame | colored overlay | heads grid].

Usage:
    python -m videotransformer_tpu.tools.visualize_attention \
        --pretrained_weights ckpt.pth --video ./demo.mp4 --output_dir ./attn
"""

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from videotransformer_tpu.data import transforms as T
from videotransformer_tpu.data.video_reader import DecordInit
from videotransformer_tpu.models import TimeSformer
from videotransformer_tpu.models.convert import init_from_kinetics_pretrain
from videotransformer_tpu.utils import denormalize

COMPANY_COLORS = [
    (0.266, 0.447, 0.768), (0.929, 0.490, 0.192), (0.255, 0.572, 0.243),
    (0.768, 0.305, 0.321), (0.459, 0.325, 0.650), (0.898, 0.768, 0.196),
]


def mass_threshold_masks(cls_attn, threshold, grid):
    """cls_attn (nh, P) -> boolean masks (nh, grid, grid) keeping `threshold`
    of the attention mass (reference visualize_attention.py:71-84)."""
    nh, P = cls_attn.shape
    order = np.argsort(cls_attn, axis=1)
    val = np.take_along_axis(cls_attn, order, axis=1)
    val = val / val.sum(axis=1, keepdims=True)
    cumval = np.cumsum(val, axis=1)
    th = cumval > (1 - threshold)
    inv = np.argsort(order, axis=1)
    th_attn = np.take_along_axis(th, inv, axis=1)
    return th_attn.reshape(nh, grid, grid).astype(np.float32)


def upsample_nearest(x, factor):
    return np.repeat(np.repeat(x, factor, axis=-2), factor, axis=-1)


def overlay_colors(frame_rgb, attn_maps, th_masks, heads=None):
    """Colored compositing (reference show_attn_color, :104-177):
    dim grayscale base + per-head colored masks, strongest head wins."""
    if heads is None:
        heads = tuple(range(min(6, attn_maps.shape[0])))
    img = frame_rgb.astype(np.float32)
    m, M = img.min(), img.max()
    span = 64
    img = ((img - m) / max(M - m, 1e-6)) * span + (256 - span)
    gray = img.mean(axis=2, keepdims=True).repeat(3, axis=2)

    masks = np.stack([attn_maps[j] * th_masks[j] for j in heads])
    # strongest head wins per pixel
    winner = masks == masks.max(axis=0, keepdims=True)
    masks = masks * winner
    a = np.cumsum(masks, axis=0)
    masks = masks * (masks == a)

    out = 0.1 * gray
    for i, color in enumerate(COMPANY_COLORS[: len(heads)]):
        mask = masks[i] > 0
        for c in range(3):
            out[..., c] = np.where(
                mask, out[..., c] * (1 - 1.0) + 1.0 * color[c] * 255, out[..., c])
    return np.clip(out, 0, 255).astype(np.uint8)


def colormap(x):
    """viridis-ish heatmap without matplotlib dependency at call sites."""
    import matplotlib.cm as cm

    normed = (x - x.min()) / max(x.max() - x.min(), 1e-8)
    return (cm.viridis(normed)[..., :3] * 255).astype(np.uint8)


def run(args):
    num_frames = getattr(args, "num_frames", 8)
    frame_interval = getattr(args, "frame_interval", 32)
    mean, std = (0.45, 0.45, 0.45), (0.225, 0.225, 0.225)

    model = TimeSformer(
        num_frames=num_frames, img_size=args.image_size, patch_size=args.patch_size,
        embed_dims=getattr(args, "embed_dims", 768),
        num_heads=getattr(args, "num_heads", 12),
        num_transformer_layers=getattr(args, "num_layers", 12),
        attention_type="divided_space_time")

    reader = DecordInit()(args.video)
    total_frames = len(reader)
    temporal_sample = T.TemporalRandomCrop(num_frames * frame_interval)
    start, end = temporal_sample(total_frames)
    if end - start < num_frames:
        raise ValueError(f"video {args.video} shorter than {num_frames} frames")
    indices = np.linspace(0, end - start - 1, num_frames, dtype=int)
    video = reader.get_batch(indices).transpose(0, 3, 1, 2).astype(np.float32)

    transform = T.Compose([
        T.Resize(scale_range=(-1, 256)),
        T.CenterCrop(args.image_size),
        T.ToTensor(),
        T.Normalize(list(mean), list(std)),
    ])
    transform.randomize_parameters()
    video = transform(video)  # (T, C, H, W)

    x = jnp.asarray(video)[None]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    if args.pretrained_weights:
        params = init_from_kinetics_pretrain(
            params, args.pretrained_weights, "divided_space_time")

    # reduce to the cls-token rows ON DEVICE: the full (T, nh, 197, 197)
    # tensor is ~150 MB and device->host transfer dominates otherwise
    attn_cls = jax.jit(
        lambda p, v: model.apply({"params": p}, v, return_attention=True)[:, :, 0, 1:]
    )(params, x)
    attn_cls = np.asarray(attn_cls)  # (T, nh, P)
    print("cls attention shape:", attn_cls.shape)

    grid = args.image_size // args.patch_size
    os.makedirs(args.output_dir, exist_ok=True)
    for i in range(num_frames):
        cls_attn = attn_cls[i]  # (nh, 196)
        nh = cls_attn.shape[0]
        th = mass_threshold_masks(cls_attn, args.threshold, grid)
        maps = cls_attn.reshape(nh, grid, grid)
        maps_up = upsample_nearest(maps, args.patch_size)
        th_up = upsample_nearest(th, args.patch_size)

        frame_rgb = denormalize(video[i], mean, std).transpose(1, 2, 0)
        color = overlay_colors(frame_rgb, maps_up, th_up)
        heads_grid = np.concatenate(
            [colormap(maps_up[j]) for j in range(nh)], axis=1)

        from PIL import Image

        h = frame_rgb.shape[0]
        row = np.concatenate([frame_rgb, color], axis=1)
        scale = h / heads_grid.shape[0]
        heads_img = Image.fromarray(
            np.clip(heads_grid, 0, 255).astype(np.uint8)).resize(
            (int(heads_grid.shape[1] * scale), h), Image.NEAREST)
        final = np.concatenate(
            [np.clip(row, 0, 255).astype(np.uint8), np.asarray(heads_img)],
            axis=1)
        out_path = os.path.join(args.output_dir, f"attn_img{i}.png")
        Image.fromarray(final).save(out_path)
    print(f"saved {num_frames} visualizations to {args.output_dir}")


def main():
    parser = argparse.ArgumentParser("Visualize Self-Attention maps")
    parser.add_argument("--arch", default="timesformer", choices=["timesformer"])
    parser.add_argument("--pretrained_weights", default="", type=str)
    parser.add_argument("--video", default="/root/reference/demo/YABnJL_bDzw.mp4")
    parser.add_argument("--output_dir", default="./attention_map")
    parser.add_argument("--threshold", type=float, default=0.6)
    parser.add_argument("--patch_size", type=int, default=16)
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--num_frames", type=int, default=8)
    parser.add_argument("--frame_interval", type=int, default=32)
    parser.add_argument("--embed_dims", type=int, default=768)
    parser.add_argument("--num_heads", type=int, default=12)
    parser.add_argument("--num_layers", type=int, default=12)
    run(parser.parse_args())


if __name__ == "__main__":
    main()
