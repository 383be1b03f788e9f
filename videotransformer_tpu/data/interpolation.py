"""Exact torch-parity separable image resize as two matmuls.

The reference resizes video tensors through torchvision, which for tensor
inputs lowers to ``torch.nn.functional.interpolate`` (NON-antialiased,
align_corners=False). ``jax.image.resize`` is always antialiased on
downscale, so it does NOT match. Instead we build the 1-D interpolation
weight matrices on the host (numpy, same kernel as torch: bilinear triangle /
bicubic Keys a=-0.75) and apply them as ``W_h @ img @ W_w^T``.

On TPU this is the ideal formulation anyway: resize becomes two dense matmuls
that XLA places on the MXU and fuses with the surrounding preprocessing.

Replaces torchvision resize paths used at data_transform.py:137-141 (Resize),
:187-188 (resized_crop), :564 (eval resize).
"""

import functools

import numpy as np


def _cubic_kernel(x, a=-0.75):
    # Keys cubic convolution kernel, identical to torch's bicubic.
    x = np.abs(x)
    out = np.where(
        x <= 1.0,
        (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0,
        np.where(x < 2.0, a * x**3 - 5.0 * a * x**2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
    return out


def _linear_kernel(x):
    x = np.abs(x)
    return np.clip(1.0 - x, 0.0, None)


@functools.lru_cache(maxsize=256)
def resize_matrix(in_size: int, out_size: int, method: str = "bicubic") -> np.ndarray:
    """(out_size, in_size) weight matrix for one axis, torch semantics
    (align_corners=False, no antialias)."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    if method == "bicubic":
        kernel, support = _cubic_kernel, 2
    elif method == "bilinear":
        kernel, support = _linear_kernel, 1
    elif method == "nearest":
        idx = np.floor(src + 0.0).astype(np.int64)
        # torch 'nearest' uses floor(dst * scale)
        idx = np.clip(np.floor(dst * scale).astype(np.int64), 0, in_size - 1)
        mat = np.zeros((out_size, in_size), dtype=np.float32)
        mat[np.arange(out_size), idx] = 1.0
        return mat
    else:
        raise ValueError(method)

    base = np.floor(src).astype(np.int64)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for t in range(-support + 1, support + 1):
        idx = base + t
        w = kernel(src - idx)
        # border replication (torch clamps source indices)
        idx_c = np.clip(idx, 0, in_size - 1)
        np.add.at(mat, (np.arange(out_size), idx_c), w)
    # torch normalizes cubic weights implicitly (they sum to 1 exactly in the
    # interior; at clamped borders the replicated taps accumulate, same as torch)
    return mat.astype(np.float32)


def resize_hw(img, out_h: int, out_w: int, method: str = "bicubic"):
    """Resize the last two axes of ``img`` (..., H, W). numpy or jax arrays."""
    in_h, in_w = img.shape[-2], img.shape[-1]
    wh = resize_matrix(in_h, out_h, method)  # (out_h, in_h)
    ww = resize_matrix(in_w, out_w, method)  # (out_w, in_w)
    if type(img).__module__.startswith("jax"):
        import jax.numpy as jnp

        wh = jnp.asarray(wh)
        ww = jnp.asarray(ww)
        x = jnp.einsum("oh,...hw->...ow", wh, img.astype(jnp.float32))
        return jnp.einsum("pw,...ow->...op", ww, x)
    x = np.einsum("oh,...hw->...ow", wh, np.asarray(img, dtype=np.float32))
    return np.einsum("pw,...ow->...op", ww, x)


def resize_short_edge(img, short: int, method: str = "bicubic"):
    """torchvision Resize(int) semantics: scale so the short edge == short."""
    h, w = img.shape[-2], img.shape[-1]
    if h <= w:
        out_h, out_w = short, max(1, int(round(short * w / h)))
        # torchvision: int(size * w / h) via floor? It uses round() since 0.8
        out_w = int(short * w / h)
    else:
        out_w, out_h = short, int(short * h / w)
    if (out_h, out_w) == (h, w):
        return img
    return resize_hw(img, out_h, out_w, method)
