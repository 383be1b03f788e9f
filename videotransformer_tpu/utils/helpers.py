"""Reference utils.py equivalents on JAX process topology.

The reference's rank helpers wrap torch.distributed (utils.py:16-34); here the
"world" is JAX's process set: get_rank -> jax.process_index(),
get_world_size -> jax.process_count(). denormalize / show_processed_image
(utils.py:69-128) keep their numerics.
"""

import functools
import time

import numpy as np

import jax


def is_dist_avail_and_initialized():
    return jax.process_count() > 1


def get_world_size():
    return jax.process_count()


def get_rank():
    return jax.process_index()


def is_main_process():
    return get_rank() == 0


def print_on_rank_zero(*args, **kwargs):
    if is_main_process():
        print(*args, **kwargs, flush=True)


def timeit_wrapper(func):
    """reference utils.py:36-40."""

    @functools.wraps(func)
    def with_time(*args, **kwargs):
        start = time.perf_counter()
        result = func(*args, **kwargs)
        print(f"{func.__name__} cost time {time.perf_counter() - start:.3f}s")
        return result

    return with_time


def build_param_groups(params, skip_keywords=("pos_embed", "cls_token", "mask_token")):
    """Split a param pytree into (no_decay, decay) path lists
    (reference utils.py:46-66 / optimizer.py:43-62 grouping rule)."""
    import jax as _jax

    flat, _ = _jax.tree_util.tree_flatten_with_path(params)
    no_decay, decay = [], []
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if leaf.ndim == 1 or name.endswith("bias") or any(
                k in name for k in skip_keywords):
            no_decay.append(name)
        else:
            decay.append(name)
    return no_decay, decay


def denormalize(data, mean, std):
    """Invert Normalize to uint8 pixels (reference utils.py:69-97).

    data: (..., C, H, W) normalized floats; mean/std per channel.
    """
    data = np.asarray(data, dtype=np.float32)
    mean = np.asarray(mean, dtype=np.float32).reshape(-1, 1, 1)
    std = np.asarray(std, dtype=np.float32).reshape(-1, 1, 1)
    out = (data * std + mean) * 255.0
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def show_processed_image(imgs, save_dir, mean, std, index=0):
    """Save a grid of the first 5 frames (reference utils.py:100-128).

    imgs: (T, H, W, C) or (B, T, H, W, C) normalized floats.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    imgs = np.asarray(imgs)
    if imgs.ndim == 5:
        imgs = imgs[index]
    n = min(5, imgs.shape[0])
    fig, axes = plt.subplots(1, n, figsize=(3 * n, 3))
    if n == 1:
        axes = [axes]
    for i in range(n):
        frame = denormalize(imgs[i].transpose(2, 0, 1), mean, std)
        axes[i].imshow(frame.transpose(1, 2, 0))
        axes[i].axis("off")
    import os

    path = os.path.join(save_dir, f"processed_frames_{index}.png")
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return path
