"""Demo-clip inference: the reference notebook path, TPU-native.

Replicates notebook/VideoTransformer_demo.ipynb cells 6-15 (SURVEY §3.4):
decode -> Resize(-1, 256) -> ThreeCrop(224) -> Normalize(0.45/0.225) ->
TimeSformer/ViViT -> per-crop logits -> mean over 3 crops -> argmax ->
classmap lookup. This is also the BASELINE.json headline config.

Usage:
    python -m videotransformer_tpu.tools.demo_inference \
        --video /root/reference/demo/YABnJL_bDzw.mp4 \
        --arch timesformer --ckpt <torch-or-orbax ckpt> [--num_frames 8]
"""

import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from videotransformer_tpu.data import transforms as T
from videotransformer_tpu.data.dataset import ASSETS_DIR
from videotransformer_tpu.data.video_reader import VideoReader
from videotransformer_tpu.models import TimeSformer, ViViT
from videotransformer_tpu.models.convert import init_from_kinetics_pretrain
from videotransformer_tpu.ops.blocks import ClassificationHead


def load_clip(video_path, num_frames, frame_interval, mean, std):
    """Decode + eval-transform one clip -> (3, T, C, 224, 224) float32."""
    vr = VideoReader(video_path)
    total_frames = len(vr)
    temporal_sample = T.TemporalRandomCrop(num_frames * frame_interval)
    start, end = temporal_sample(total_frames)
    indices = np.linspace(0, end - start - 1, num_frames, dtype=int)
    video = vr.get_batch(indices)  # (T, H, W, C) uint8
    video = video.transpose(0, 3, 1, 2).astype(np.float32)

    transform = T.Compose([
        T.Resize(scale_range=(-1, 256)),
        T.ThreeCrop(size=224),
        T.ToTensor(),
        T.Normalize(list(mean), list(std)),
    ])
    transform.randomize_parameters()
    return transform(video)


def build_model(arch, num_frames, attention_type=None):
    if arch == "timesformer":
        return TimeSformer(
            num_frames=num_frames,
            attention_type=attention_type or "divided_space_time")
    elif arch == "vivit":
        return ViViT(
            num_frames=num_frames,
            attention_type=attention_type or "fact_encoder")
    raise ValueError(arch)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", default="/root/reference/demo/YABnJL_bDzw.mp4")
    p.add_argument("--arch", default="timesformer")
    p.add_argument("--attention_type", default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--num_frames", type=int, default=8)
    p.add_argument("--frame_interval", type=int, default=32)
    p.add_argument("--num_class", type=int, default=400)
    args = p.parse_args()

    with open(os.path.join(ASSETS_DIR, f"k{args.num_class}_classmap.json")) as f:
        classmap = json.load(f)
    idx_to_class = {int(v): k for k, v in classmap.items()}

    clip = load_clip(args.video, args.num_frames, args.frame_interval,
                     (0.45, 0.45, 0.45), (0.225, 0.225, 0.225))
    clip = jnp.asarray(clip)  # (3, T, C, H, W)

    model = build_model(args.arch, args.num_frames, args.attention_type)
    head = ClassificationHead(args.num_class, model.embed_dims)
    # jit the init: eager init would execute layer-by-layer over the device
    # tunnel (minutes); jitted it is one compiled program
    params = jax.jit(model.init)(jax.random.PRNGKey(0), clip)["params"]
    head_params = jax.jit(head.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, model.embed_dims)))["params"]

    if args.ckpt:
        params = init_from_kinetics_pretrain(
            params, args.ckpt,
            args.attention_type or ("divided_space_time" if args.arch == "timesformer" else "fact_encoder"))
        # the same surgery carries cls_head.* keys; import them into the head
        from videotransformer_tpu.models.convert import (
            load_torch_state_dict, merge_params, replace_state_dict, torch_to_flax_params)

        sd = replace_state_dict(load_torch_state_dict(args.ckpt))
        head_sd = {k: v for k, v in sd.items() if k.startswith("cls_head")}
        if head_sd:
            head_params, _, _ = merge_params(head_params, torch_to_flax_params(head_sd))

    @jax.jit
    def infer(params, head_params, clip):
        feats = model.apply({"params": params}, clip)
        logits = head.apply({"params": head_params}, feats)
        return logits.reshape(-1, 3, args.num_class).mean(axis=1)

    t0 = time.time()
    logits = jax.block_until_ready(infer(params, head_params, clip))
    compile_s = time.time() - t0
    t0 = time.time()
    logits = jax.block_until_ready(infer(params, head_params, clip))
    run_ms = 1000 * (time.time() - t0)

    pred = int(jnp.argmax(logits[0]))
    print(f"prediction: {pred} ({idx_to_class.get(pred, '?')})")
    print(f"compile {compile_s:.1f}s, steady-state {run_ms:.1f}ms for 3 crops")


if __name__ == "__main__":
    main()
