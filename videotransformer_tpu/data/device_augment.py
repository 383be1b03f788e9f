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


# ---------------------------------------------------------------------------
# Device-side RandAugment (parity target: data/rand_augment.py, which itself
# mirrors torchvision's num_ops=2/magnitude=9/31-bin policy the reference
# enables via -auto_augment, data_transform.py:518-529). All 14 ops run as one
# jit-able lax.switch per draw; the host class is the numerics golden.
# ---------------------------------------------------------------------------

def _affine_nearest(clip, m):
    """Nearest-neighbor warp of (T, H, W, C) by a FORWARD 2x3 matrix with
    cv2.warpAffine semantics (matrix inverted internally, fill=0, nearest =
    floor(src + 0.5)). The host twin is rand_augment._affine_clip."""
    H, W = clip.shape[1], clip.shape[2]
    a, b, c = m[0][0], m[0][1], m[0][2]
    d, e, f = m[1][0], m[1][1], m[1][2]
    det = a * e - b * d
    X, Y = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32))
    sx = (e * (X - c) - b * (Y - f)) / det
    sy = (-d * (X - c) + a * (Y - f)) / det
    xi = jnp.floor(sx + 0.5).astype(jnp.int32)
    yi = jnp.floor(sy + 0.5).astype(jnp.int32)
    valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    out = clip[:, jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1), :]
    return jnp.where(valid[None, :, :, None], out, 0.0)


def ra_shear(clip, sx=0.0, sy=0.0):
    H, W = clip.shape[1], clip.shape[2]
    cx, cy = W * 0.5, H * 0.5
    return _affine_nearest(clip, ((1.0, sx, -sx * cy), (sy, 1.0, -sy * cx)))


def ra_translate(clip, tx=0.0, ty=0.0):
    # host: int(mag * size) truncates toward zero
    return _affine_nearest(
        clip, ((1.0, 0.0, jnp.trunc(tx)), (0.0, 1.0, jnp.trunc(ty))))


def ra_rotate(clip, deg):
    H, W = clip.shape[1], clip.shape[2]
    cx, cy = W * 0.5, H * 0.5
    rad = deg * (math.pi / 180.0)
    al, be = jnp.cos(rad), jnp.sin(rad)
    return _affine_nearest(
        clip, ((al, be, (1.0 - al) * cx - be * cy),
               (-be, al, be * cx + (1.0 - al) * cy)))


def ra_brightness(clip, mag):
    return jnp.clip(clip * (1.0 + mag), 0.0, 255.0)


def ra_color(clip, mag):
    return jnp.clip((1.0 + mag) * clip - mag * _rgb_to_gray(clip), 0.0, 255.0)


def ra_contrast(clip, mag):
    # host: per-CLIP mean of the gray image (axis (-3,-2,-1) of (T,C,H,W)
    # is (C,H,W) per frame... gray has C=1, so it is a per-frame mean)
    mean = _rgb_to_gray(clip).mean(axis=(-3, -2, -1), keepdims=True)
    return jnp.clip((1.0 + mag) * clip - mag * mean, 0.0, 255.0)


def ra_sharpness(clip, mag):
    """factor*x + (1-factor)*smooth, PIL SMOOTH kernel, replicate border in
    the conv, 1-pixel border left unsmoothed (host rand_augment._sharpness)."""
    T_, H, W, C = clip.shape
    factor = 1.0 + mag
    x = clip.transpose(0, 3, 1, 2).reshape(T_ * C, 1, H, W)
    pad = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
    k = jnp.asarray([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    sm = jax.lax.conv_general_dilated(pad, k[None, None], (1, 1), "VALID")
    border = jnp.zeros((H, W), bool)
    border = border.at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    sm = jnp.where(border[None, None], x, sm)
    out = jnp.clip(factor * x + (1.0 - factor) * sm, 0.0, 255.0)
    return out.reshape(T_, C, H, W).transpose(0, 2, 3, 1)


def ra_posterize(clip, bits):
    mask = 255 - (2 ** (8 - bits) - 1)
    return (clip.astype(jnp.uint8) & jnp.uint8(mask)).astype(clip.dtype)


def ra_solarize(clip, threshold):
    return jnp.where(clip >= threshold, 255.0 - clip, clip)


def ra_autocontrast(clip):
    # per frame, per channel (host rand_augment._autocontrast)
    lo = clip.min(axis=(1, 2), keepdims=True)
    hi = clip.max(axis=(1, 2), keepdims=True)
    scale = jnp.where(hi > lo, 255.0 / jnp.maximum(hi - lo, 1e-6), 1.0)
    out = jnp.where(hi > lo, (clip - lo) * scale, clip)
    return jnp.clip(out, 0.0, 255.0)


def ra_equalize(clip):
    """cv2.equalizeHist per frame/channel: lut[i] = round((cdf[i] -
    cdf[first_nonzero]) * 255 / (total - hist[first_nonzero])), identity when
    a single gray level fills the image."""
    T_, H, W, C = clip.shape
    u8 = jnp.clip(clip, 0.0, 255.0).astype(jnp.uint8)
    flat = u8.transpose(0, 3, 1, 2).reshape(T_ * C, H * W).astype(jnp.int32)

    def eq(v):
        hist = jnp.bincount(v, length=256)
        first = jnp.argmax(hist > 0)
        hf = hist[first]
        total = v.shape[0]
        scale = 255.0 / jnp.maximum(total - hf, 1).astype(jnp.float32)
        cdf = jnp.cumsum(hist)
        lut = jnp.clip(jnp.rint((cdf - cdf[first]).astype(jnp.float32)
                                * scale), 0.0, 255.0)
        lut = jnp.where(hf == total,
                        jnp.arange(256, dtype=jnp.float32), lut)
        return lut[v]

    out = jax.vmap(eq)(flat).reshape(T_, C, H, W).transpose(0, 2, 3, 1)
    return out.astype(clip.dtype)


def _ra_magnitudes(magnitude, bins):
    """Static per-op magnitude at the chosen index (host RandAugment._space)."""
    import numpy as np

    lin = lambda a, b: float(np.linspace(a, b, bins)[magnitude])
    return {
        "shear": lin(0.0, 0.3),
        "translate": lin(0.0, 150.0 / 331.0),
        "rotate": lin(0.0, 30.0),
        "photo": lin(0.0, 0.9),
        "posterize": int(8 - round(magnitude / ((bins - 1) / 4))),
        "solarize": lin(255.0, 0.0),
    }


def rand_augment_clip(key, clip, num_ops=2, magnitude=9, bins=31):
    """Device RandAugment on one clip (T, S, S, C) float32 in [0, 255]:
    num_ops draws from the 14-op space, clip-consistent (one draw applies to
    all frames), magnitudes static, signs random — the host class
    (data/rand_augment.py) is the op-level numerics golden."""
    m = _ra_magnitudes(magnitude, bins)
    H, W = clip.shape[1], clip.shape[2]

    branches = [
        lambda x, s: x,                                        # Identity
        lambda x, s: ra_shear(x, sx=s * m["shear"]),           # ShearX
        lambda x, s: ra_shear(x, sy=s * m["shear"]),           # ShearY
        lambda x, s: ra_translate(x, tx=s * m["translate"] * W),
        lambda x, s: ra_translate(x, ty=s * m["translate"] * H),
        lambda x, s: ra_rotate(x, s * m["rotate"]),            # Rotate
        lambda x, s: ra_brightness(x, s * m["photo"]),
        lambda x, s: ra_color(x, s * m["photo"]),
        lambda x, s: ra_contrast(x, s * m["photo"]),
        lambda x, s: ra_sharpness(x, s * m["photo"]),
        lambda x, s: ra_posterize(x, m["posterize"]),
        lambda x, s: ra_solarize(x, m["solarize"]),
        lambda x, s: ra_autocontrast(x),
        lambda x, s: ra_equalize(x),
    ]

    for _ in range(num_ops):
        key, k_op, k_sign = jax.random.split(key, 3)
        op = jax.random.randint(k_op, (), 0, len(branches))
        sign = jnp.where(jax.random.uniform(k_sign) > 0.5, -1.0, 1.0)
        clip = jax.lax.switch(
            op, [partial(b, s=sign) for b in branches], clip)
    return clip


def augment_clip(key, clip, out_size=224, scale=(0.08, 1.0),
                 ratio=(3 / 4, 4 / 3), hflip=0.5, color=(0.4, 0.4, 0.4, 0.0),
                 auto_augment=False,
                 mean=(0.45, 0.45, 0.45), std=(0.225, 0.225, 0.225),
                 with_raw=False):
    """One clip (T, H, W, C) uint8 -> (T, C, S, S) normalized float32.

    ``auto_augment=True`` inserts RandAugment after crop+flip and disables
    color jitter — the reference's RandAugment-OR-ColorJitter rule
    (data_transform.py:519-529).

    ``with_raw=True`` additionally returns the augmented clip BEFORE
    ToTensor+Normalize ((T, C, S, S) float32 in [0, 255]) — the mim
    objective's HOG targets read exactly these pixels (the reference splits
    its transform into [geometric, ToTensor+Normalize] for the same reason,
    data_trainer.py:61-66 / data_transform.py:540-543)."""
    k_rrc, k_flip, k_jit = jax.random.split(key, 3)
    clip = clip.astype(jnp.float32)
    T_, H, W, C = clip.shape
    top, left, ch, cw = rrc_params(k_rrc, H, W, scale, ratio)
    out = resized_crop(clip, top, left, ch, cw, out_size, out_size)
    do_flip = jax.random.uniform(k_flip) < hflip
    out = jnp.where(do_flip, out[:, :, ::-1, :], out)
    if auto_augment:
        out = rand_augment_clip(k_jit, out)
    elif any(color):
        out = color_jitter(k_jit, out, *color)
    raw = out
    out = out / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    out = ((out - mean) / std).transpose(0, 3, 1, 2)  # (T, C, S, S)
    if with_raw:
        return out, raw.transpose(0, 3, 1, 2)
    return out


@partial(jax.jit, static_argnames=("out_size", "scale", "ratio", "hflip",
                                   "color", "auto_augment", "mean", "std",
                                   "with_raw"))
def augment_batch(key, batch, out_size=224, scale=(0.08, 1.0),
                  ratio=(3 / 4, 4 / 3), hflip=0.5, color=(0.4, 0.4, 0.4, 0.0),
                  auto_augment=False,
                  mean=(0.45, 0.45, 0.45), std=(0.225, 0.225, 0.225),
                  with_raw=False):
    """batch (B, T, H, W, C) uint8 -> (B, T, C, S, S); one key per clip.
    ``with_raw`` -> (normalized, unnormalized-[0,255]) pair (see
    augment_clip)."""
    keys = jax.random.split(key, batch.shape[0])
    fn = partial(augment_clip, out_size=out_size, scale=scale, ratio=ratio,
                 hflip=hflip, color=color, auto_augment=auto_augment,
                 mean=mean, std=std, with_raw=with_raw)
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
