"""Synthesize the bundled demo clips (our own assets, not the reference's).

The reference bundles two downloaded Kinetics mp4s under demo/ (SURVEY §2.1
#18); we generate ours with the native FFmpeg encoder so the repo is fully
self-contained: four visually-distinct motion classes, three clips each, plus
a kinetics-format annotation list and classmap. Deterministic (seeded), so
re-running reproduces byte-identical pixel content.

Usage: python tools/make_demo_assets.py [out_dir]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from videotransformer_tpu.native.videoenc import write_video  # noqa: E402

T, H, W = 40, 192, 256
FPS = 25

CLASSES = ["bar_slide_h", "bar_slide_v", "pulse_circle", "checker_spin"]


def _base(rng, h, w):
    """Low-frequency random background."""
    small = rng.rand(h // 16, w // 16, 3)
    big = np.kron(small, np.ones((16, 16, 1)))
    return (big * 80 + 60).astype(np.float32)


def make_clip(cls: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(1000 * cls + seed)
    bg = _base(rng, H, W)
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    speed = 3 + rng.randint(0, 4)
    phase = rng.randint(0, 64)
    frames = np.empty((T, H, W, 3), np.uint8)
    color = rng.rand(3) * 155 + 100
    for t in range(T):
        img = bg.copy()
        if cls == 0:  # horizontal sliding bar
            c = (phase + t * speed) % W
            m = (np.abs(((x - c + W / 2) % W) - W / 2) < 14)
        elif cls == 1:  # vertical sliding bar
            c = (phase + t * speed) % H
            m = (np.abs(((y - c + H / 2) % H) - H / 2) < 14)
        elif cls == 2:  # pulsing circle
            r = 20 + 30 * (0.5 + 0.5 * np.sin((t + phase) * 0.35))
            m = ((x - W / 2) ** 2 + (y - H / 2) ** 2) < r ** 2
        else:  # rotating checkerboard
            a = (t + phase) * 0.12
            u = np.cos(a) * (x - W / 2) + np.sin(a) * (y - H / 2)
            v = -np.sin(a) * (x - W / 2) + np.cos(a) * (y - H / 2)
            m = ((u // 24).astype(int) + (v // 24).astype(int)) % 2 == 0
        img[m] = color
        frames[t] = np.clip(img, 0, 255).astype(np.uint8)
    return frames


def main(out_dir=None):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = out_dir or os.path.join(
        here, "videotransformer_tpu", "data", "assets", "demo")
    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for cls in range(len(CLASSES)):
        for seed in range(3):
            name = f"{CLASSES[cls]}_{seed}.mp4"
            write_video(os.path.join(out_dir, name), make_clip(cls, seed), FPS)
            rows.append(f"{name}\t{CLASSES[cls]}")
    with open(os.path.join(out_dir, "demo_train_list.txt"), "w") as f:
        f.write("\n".join(rows) + "\n")
    with open(os.path.join(out_dir, "demo_classmap.json"), "w") as f:
        json.dump({c: str(i) for i, c in enumerate(CLASSES)}, f, indent=1)
    print(f"wrote {len(rows)} clips to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
