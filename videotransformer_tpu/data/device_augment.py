"""Fused device-side train augmentation.

The reference runs torchvision augmentation on CPU workers (SURVEY §2.3:
"fold resize/crop/flip/normalize into device-side JAX preprocessing"). Here the
whole train augment — clip-consistent RandomResizedCrop (bicubic), horizontal
flip, color jitter (random order), scale-to-[0,1] and Normalize — is one
jit-able function of (key, uint8 batch) that XLA fuses into the input side of
the train step. Decode workers only produce fixed-size uint8 clips.

Key design points for TPU:
- the dynamic crop+resize is expressed as two dense interpolation-weight
  matmuls whose weights are computed on device from traced (top, left, h, w)
  — dynamic content, static shapes, MXU-friendly.
- one PRNG key per clip (vmap over the batch) reproduces the reference's
  clip-consistent randomization (one draw applies to all T frames).
- color-jitter op order is a per-clip random permutation applied with
  lax.switch, matching torchvision ColorJitter semantics
  (data_transform.py:531 uses torchvision ColorJitter).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp


def _cubic_weights(src, in_size, lo, hi, a=-0.75):
    """Dense (out, in) Keys-cubic weight matrix for traced src coords (out,).
    Taps clamp to [lo, hi] — the crop box — so borders replicate the crop edge
    exactly like torchvision's crop-then-resize."""
    base = jnp.floor(src)
    idx = jnp.arange(in_size)[None, :]  # (1, in)
    mat = jnp.zeros((src.shape[0], in_size), jnp.float32)
    for t in range(-1, 3):
        tap = base + t  # (out,)
        x = jnp.abs(src - tap)
        w = jnp.where(
            x <= 1.0,
            (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0,
            jnp.where(x < 2.0, a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a, 0.0),
        )
        tap_c = jnp.clip(tap, lo, hi).astype(jnp.int32)
        mat = mat + w[:, None] * (idx == tap_c[:, None])
    return mat


def resized_crop(clip, top, left, crop_h, crop_w, out_h, out_w):
    """clip (T, H, W, C) float; traced crop box; bicubic resize to out size."""
    H, W = clip.shape[1], clip.shape[2]
    scale_h = crop_h / out_h
    scale_w = crop_w / out_w
    src_y = top + (jnp.arange(out_h) + 0.5) * scale_h - 0.5
    src_x = left + (jnp.arange(out_w) + 0.5) * scale_w - 0.5
    top_i = jnp.floor(top)
    left_i = jnp.floor(left)
    wh = _cubic_weights(src_y, H, top_i, top_i + jnp.floor(crop_h) - 1)
    ww = _cubic_weights(src_x, W, left_i, left_i + jnp.floor(crop_w) - 1)
    out = jnp.einsum("oh,thwc->towc", wh, clip)
    out = jnp.einsum("pw,towc->topc", ww, out)
    return out


def rrc_params(key, H, W, scale, ratio):
    """torchvision RandomResizedCrop sampling, traced: 10 candidates drawn in
    parallel, first valid wins, center-crop fallback."""
    k_area, k_ratio, k_i, k_j = jax.random.split(key, 4)
    area = float(H * W)
    target_area = area * jax.random.uniform(
        k_area, (10,), minval=scale[0], maxval=scale[1])
    aspect = jnp.exp(jax.random.uniform(
        k_ratio, (10,), minval=math.log(ratio[0]), maxval=math.log(ratio[1])))
    w = jnp.round(jnp.sqrt(target_area * aspect))
    h = jnp.round(jnp.sqrt(target_area / aspect))
    valid = (w > 0) & (w <= W) & (h > 0) & (h <= H)
    first = jnp.argmax(valid.astype(jnp.int32) * jnp.arange(10, 0, -1))
    ok = valid.any()

    w_sel = w[first]
    h_sel = h[first]
    u_i = jax.random.uniform(k_i)
    u_j = jax.random.uniform(k_j)
    top = jnp.floor(u_i * (H - h_sel + 1))
    left = jnp.floor(u_j * (W - w_sel + 1))

    # fallback: clamped-aspect center crop (torchvision)
    in_ratio = W / H
    fb_w = jnp.where(in_ratio < ratio[0], float(W),
                     jnp.where(in_ratio > ratio[1],
                               jnp.round(H * ratio[1]), float(W)))
    fb_h = jnp.where(in_ratio < ratio[0], jnp.round(W / ratio[0]),
                     jnp.where(in_ratio > ratio[1], float(H), float(H)))
    fb_top = jnp.floor((H - fb_h) / 2)
    fb_left = jnp.floor((W - fb_w) / 2)

    top = jnp.where(ok, top, fb_top)
    left = jnp.where(ok, left, fb_left)
    h_sel = jnp.where(ok, h_sel, fb_h)
    w_sel = jnp.where(ok, w_sel, fb_w)
    return top, left, h_sel, w_sel


def _rgb_to_gray(x):
    # x (..., C) with C=3, ITU-R 601-2
    return (0.2989 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])[..., None]


def color_jitter(key, clip, brightness, contrast, saturation, hue):
    """clip (T, S, S, C) in [0, 255]; one factor draw, random op order."""
    kb, kc, ks, kh, kperm = jax.random.split(key, 5)
    fb = jax.random.uniform(kb, minval=max(0, 1 - brightness), maxval=1 + brightness) \
        if brightness else 1.0
    fc = jax.random.uniform(kc, minval=max(0, 1 - contrast), maxval=1 + contrast) \
        if contrast else 1.0
    fs = jax.random.uniform(ks, minval=max(0, 1 - saturation), maxval=1 + saturation) \
        if saturation else 1.0
    fh = jax.random.uniform(kh, minval=-hue, maxval=hue) if hue else 0.0

    def op_brightness(x):
        return jnp.clip(x * fb, 0.0, 255.0)

    def op_contrast(x):
        mean = _rgb_to_gray(x).mean(axis=(-3, -2, -1), keepdims=True)
        return jnp.clip(fc * x + (1 - fc) * mean, 0.0, 255.0)

    def op_saturation(x):
        return jnp.clip(fs * x + (1 - fs) * _rgb_to_gray(x), 0.0, 255.0)

    def op_hue(x):
        if not hue:
            return x
        s = x / 255.0
        r, g, b = s[..., 0], s[..., 1], s[..., 2]
        maxc = jnp.maximum(jnp.maximum(r, g), b)
        minc = jnp.minimum(jnp.minimum(r, g), b)
        eqc = maxc == minc
        cr = maxc - minc
        ones = jnp.ones_like(maxc)
        sat = cr / jnp.where(eqc, ones, maxc)
        cr_div = jnp.where(eqc, ones, cr)
        rc = (maxc - r) / cr_div
        gc = (maxc - g) / cr_div
        bc = (maxc - b) / cr_div
        hh = ((maxc == r) * (bc - gc)
              + ((maxc == g) & (maxc != r)) * (2.0 + rc - bc)
              + ((maxc != g) & (maxc != r)) * (4.0 + gc - rc))
        hh = (hh / 6.0 + 1.0) % 1.0
        hh = (hh + fh) % 1.0
        i = jnp.floor(hh * 6.0)
        f = hh * 6.0 - i
        i = i.astype(jnp.int32) % 6
        p = jnp.clip(maxc * (1.0 - sat), 0.0, 1.0)
        q = jnp.clip(maxc * (1.0 - sat * f), 0.0, 1.0)
        t = jnp.clip(maxc * (1.0 - sat * (1.0 - f)), 0.0, 1.0)
        a1 = jnp.stack([maxc, q, p, p, t, maxc], axis=-1)
        a2 = jnp.stack([t, maxc, maxc, q, p, p], axis=-1)
        a3 = jnp.stack([p, p, t, maxc, maxc, q], axis=-1)
        sel = jax.nn.one_hot(i, 6, dtype=x.dtype)
        rgb = jnp.stack([(sel * a1).sum(-1), (sel * a2).sum(-1), (sel * a3).sum(-1)],
                        axis=-1)
        return rgb * 255.0

    ops = [op_brightness, op_contrast, op_saturation, op_hue]
    perm = jax.random.permutation(kperm, 4)

    def body(i, x):
        return jax.lax.switch(perm[i], ops, x)

    return jax.lax.fori_loop(0, 4, body, clip)


def augment_clip(key, clip, out_size=224, scale=(0.08, 1.0),
                 ratio=(3 / 4, 4 / 3), hflip=0.5, color=(0.4, 0.4, 0.4, 0.0),
                 mean=(0.45, 0.45, 0.45), std=(0.225, 0.225, 0.225)):
    """One clip (T, H, W, C) uint8 -> (T, C, S, S) normalized float32."""
    k_rrc, k_flip, k_jit = jax.random.split(key, 3)
    clip = clip.astype(jnp.float32)
    T_, H, W, C = clip.shape
    top, left, ch, cw = rrc_params(k_rrc, H, W, scale, ratio)
    out = resized_crop(clip, top, left, ch, cw, out_size, out_size)
    do_flip = jax.random.uniform(k_flip) < hflip
    out = jnp.where(do_flip, out[:, :, ::-1, :], out)
    if any(color):
        out = color_jitter(k_jit, out, *color)
    out = out / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    out = (out - mean) / std
    return out.transpose(0, 3, 1, 2)  # (T, C, S, S)


@partial(jax.jit, static_argnames=("out_size", "scale", "ratio", "hflip",
                                   "color", "mean", "std"))
def augment_batch(key, batch, out_size=224, scale=(0.08, 1.0),
                  ratio=(3 / 4, 4 / 3), hflip=0.5, color=(0.4, 0.4, 0.4, 0.0),
                  mean=(0.45, 0.45, 0.45), std=(0.225, 0.225, 0.225)):
    """batch (B, T, H, W, C) uint8 -> (B, T, C, S, S); one key per clip."""
    keys = jax.random.split(key, batch.shape[0])
    fn = partial(augment_clip, out_size=out_size, scale=scale, ratio=ratio,
                 hflip=hflip, color=color, mean=mean, std=std)
    return jax.vmap(fn)(keys, batch)


def eval_preprocess_batch(batch, img_size=224, crop_pct=0.875,
                          three_crop=False, interpolation="bicubic",
                          mean=(0.45, 0.45, 0.45), std=(0.225, 0.225, 0.225)):
    """Deterministic device-side eval preprocessing of raw decoded clips.

    Mirrors the reference eval recipes (data_trainer.py:94-121) on device:
    val  = Resize(short=floor(img_size/crop_pct)) + CenterCrop(img_size)
    test = Resize(-1, 256) + ThreeCrop(img_size)
    then ToTensor(/255) + Normalize. Input is the loader's canonical uint8
    (B, T, H, W, C) batch (decode-time short-edge resize, dataset.py raw-clip
    mode); shapes are static, so the bicubic/bilinear resize folds into two
    constant weight matmuls (interpolation.resize_matrix) on the MXU.

    Returns (B, T, C, S, S) float32, or (B*3, T, C, S, S) for three_crop with
    crops adjacent per sample — matching the host ThreeCrop collate layout the
    eval step's ``logits.reshape(-1, n_crops, ...)`` expects.
    """
    from videotransformer_tpu.data.interpolation import resize_matrix

    B, T_, H, W, C = batch.shape
    S = int(img_size)
    short = 256 if three_crop else int(math.floor(S / crop_pct))
    if H <= W:
        out_h, out_w = short, int(short * W / H)
    else:
        out_w, out_h = short, int(short * H / W)
    x = batch.astype(jnp.float32)
    if (out_h, out_w) != (H, W):
        wh = jnp.asarray(resize_matrix(H, out_h, interpolation), jnp.float32)
        ww = jnp.asarray(resize_matrix(W, out_w, interpolation), jnp.float32)
        x = jnp.einsum("oh,bthwc->btowc", wh, x)
        x = jnp.einsum("pw,btowc->btopc", ww, x)
    if three_crop:
        # left / right / center, the reference ThreeCrop order and offsets
        # (data_transform.py:412-469: floor-half vertical center)
        y0 = (out_h - S) // 2
        xs = (0, out_w - S, (out_w - S) // 2)
        x = jnp.stack([x[:, :, y0:y0 + S, x0:x0 + S, :] for x0 in xs], axis=1)
        x = x.reshape(B * 3, T_, S, S, C)
    else:
        # CenterCrop rounds the half-offset (data_transform.py:389-409)
        y0 = int(round((out_h - S) / 2.0))
        x0 = int(round((out_w - S) / 2.0))
        x = x[:, :, y0:y0 + S, x0:x0 + S, :]
    x = x / 255.0
    x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    return x.transpose(0, 1, 4, 2, 3)  # (B[, *3], T, C, S, S)
