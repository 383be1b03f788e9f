"""HOG feature targets for MaskFeat, on device.

Reimplements the exact algorithm of ``skimage.feature.hog`` with the
reference's parameters (orientations=9, pixels_per_cell=(8,8),
cells_per_block=(1,1), block_norm='L2', feature_vector=False — reference
dataset.py:39-45), vectorized so it runs inside the XLA input fusion on TPU
instead of a per-frame Cython loop on the host (SURVEY §2.3).

skimage semantics reproduced:
- gradients: central differences with zeroed borders
  (skimage _hog_channel_gradient).
- orientation = rad2deg(arctan2(g_row, g_col)) mod 180; hard binning into
  [20*i, 20*(i+1)) (skimage _hoghistogram.cell_hog — no interpolation).
- cell value = MEAN magnitude over the 8x8 cell (cell_hog divides by the cell
  pixel count).
- L2 block norm with eps=1e-5: cell / sqrt(sum(cell^2) + eps^2).

Output layout matches reference extract_hog_features (dataset.py:39-45):
per 224x224 RGB frame -> (14, 14, 108) where each 2x2 neighborhood of 8x8
cells is flattened as (dh, dw, [r9, g9, b9]).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _hog_cells_np(img, orientations=9, cell=8):
    img = np.asarray(img, dtype=np.float64)
    g_row = np.zeros_like(img)
    g_col = np.zeros_like(img)
    g_row[1:-1, :] = img[2:, :] - img[:-2, :]
    g_col[:, 1:-1] = img[:, 2:] - img[:, :-2]
    mag = np.hypot(g_row, g_col)
    ori = np.rad2deg(np.arctan2(g_row, g_col)) % 180
    bins = np.minimum((ori / (180 / orientations)).astype(np.int64), orientations - 1)
    h, w = img.shape
    ch, cw = h // cell, w // cell
    onehot = np.eye(orientations)[bins] * mag[..., None]
    cells = onehot[: ch * cell, : cw * cell].reshape(ch, cell, cw, cell, orientations)
    cells = cells.sum(axis=(1, 3)) / (cell * cell)
    eps = 1e-5
    norm = np.sqrt(np.sum(cells**2, axis=-1, keepdims=True) + eps**2)
    return cells / norm


def extract_hog_features_np(image, orientations=9, cell=8):
    """image (H, W, 3) -> (H/16, W/16, 2*2*3*orientations). Host fallback."""
    per_ch = [_hog_cells_np(image[:, :, c], orientations, cell) for c in range(3)]
    cells = np.concatenate(per_ch, axis=-1)  # (ch, cw, 3*orient)
    ch, cw, f = cells.shape
    # '(ph dh) (pw dw) c -> ph pw (dh dw c)' with dh=dw=2
    out = cells.reshape(ch // 2, 2, cw // 2, 2, f).transpose(0, 2, 1, 3, 4)
    return out.reshape(ch // 2, cw // 2, 2 * 2 * f).astype(np.float32)


def _hog_cells_jnp(img, orientations=9, cell=8):
    """img (H, W) float32 -> (H/cell, W/cell, orientations)."""
    img = img.astype(jnp.float32)
    g_row = jnp.zeros_like(img).at[1:-1, :].set(img[2:, :] - img[:-2, :])
    g_col = jnp.zeros_like(img).at[:, 1:-1].set(img[:, 2:] - img[:, :-2])
    mag = jnp.sqrt(g_row**2 + g_col**2)
    ori = jnp.rad2deg(jnp.arctan2(g_row, g_col)) % 180.0
    bins = jnp.minimum(
        (ori / (180.0 / orientations)).astype(jnp.int32), orientations - 1
    )
    onehot = jax.nn.one_hot(bins, orientations, dtype=img.dtype) * mag[..., None]
    h, w = img.shape
    ch, cw = h // cell, w // cell
    cells = onehot[: ch * cell, : cw * cell].reshape(ch, cell, cw, cell, orientations)
    cells = cells.sum(axis=(1, 3)) / (cell * cell)
    eps = 1e-5
    norm = jnp.sqrt(jnp.sum(cells**2, axis=-1, keepdims=True) + eps**2)
    return cells / norm


@functools.partial(jax.jit, static_argnums=(1, 2))
def extract_hog_features(image, orientations=9, cell=8):
    """image (H, W, 3) -> (H/(2*cell), W/(2*cell), 2*2*3*orientations), on device."""
    per_ch = [_hog_cells_jnp(image[:, :, c], orientations, cell) for c in range(3)]
    cells = jnp.concatenate(per_ch, axis=-1)
    ch, cw, f = cells.shape
    out = cells.reshape(ch // 2, 2, cw // 2, 2, f).transpose(0, 2, 1, 3, 4)
    return out.reshape(ch // 2, cw // 2, 2 * 2 * f)


def batched_hog_targets(video, orientations=9, cell=8):
    """video (..., H, W, 3) -> (..., H/16, W/16, 108); vmapped over leading axes.

    Used by the MaskFeat train step to compute targets on device from the
    un-normalized clip (reference computes HOG before Normalize,
    data_trainer.py:61-66 / dataset.py:174-176).
    """
    flat_shape = video.shape[:-3]
    h, w = video.shape[-3], video.shape[-2]
    flat = video.reshape((-1, h, w, 3))
    fn = jax.vmap(lambda im: extract_hog_features(im, orientations, cell))
    out = fn(flat)
    return out.reshape(flat_shape + out.shape[1:])
