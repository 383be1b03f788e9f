"""Mixup / CutMix as batched device ops (reference mixup.py, timm-derived).

Parity targets (citations into /root/reference/mixup.py):
- batch mode: one (lam, use_cutmix) draw per batch (:84-100); pairing by
  ``flip(0)`` (:109-112, :24); Beta(0.8, 0.8) mixup / Beta(1, 1) cutmix,
  switch_prob 0.5, prob 1.0, label smoothing 0.1 (:72-73).
- cutmix box: square around a uniform center, clipped, with lambda correction
  by actual box area (:27-57).
- soft targets: one-hot with smoothing, mixed by lam (:20-25).
- video handled as (B, T, C, H, W): the cut box applies to every frame
  (reference reshapes to (B, T*C, H, W) before 2-D mixing :116-125 — same
  effect).

TPU-native design: the random draws happen with explicit PRNG keys *inside*
the jitted train step, so the mix fuses with normalization into the input
pipeline — no host round-trip. Dynamic box slicing is replaced by a
broadcasted coordinate mask (static shapes; jit-friendly).
"""

import jax
import jax.numpy as jnp


def one_hot(x, num_classes, on_value=1.0, off_value=0.0):
    return jax.nn.one_hot(x, num_classes) * (on_value - off_value) + off_value


def mixup_target(target, num_classes, lam=1.0, smoothing=0.0):
    off_value = smoothing / num_classes
    on_value = 1.0 - smoothing + off_value
    y1 = one_hot(target, num_classes, on_value, off_value)
    y2 = one_hot(jnp.flip(target, 0), num_classes, on_value, off_value)
    return y1 * lam + y2 * (1.0 - lam)


def _rand_bbox(key, h, w, lam):
    """Square box around a uniform center (reference mixup.py:27-48)."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    ky, kx = jax.random.split(key)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    yl = jnp.clip(cy - cut_h // 2, 0, h)
    yh = jnp.clip(cy + cut_h // 2, 0, h)
    xl = jnp.clip(cx - cut_w // 2, 0, w)
    xh = jnp.clip(cx + cut_w // 2, 0, w)
    return yl, yh, xl, xh


class Mixup:
    """Batch-mode Mixup/CutMix. Call inside jit with an explicit key."""

    def __init__(self, mixup_alpha=0.8, cutmix_alpha=1.0, prob=1.0,
                 switch_prob=0.5, mode="batch", correct_lam=True,
                 label_smoothing=0.1, num_classes=1000):
        assert mode == "batch", "batch mode only (reference uses batch mode)"
        self.mixup_alpha = mixup_alpha
        self.cutmix_alpha = cutmix_alpha
        self.mix_prob = prob
        self.switch_prob = switch_prob
        self.label_smoothing = label_smoothing
        self.num_classes = num_classes
        self.correct_lam = correct_lam

    def __call__(self, key, x, target):
        """x: (B, T, C, H, W) float; target: (B,) int. Returns mixed x, soft y."""
        k_prob, k_switch, k_lam_mix, k_lam_cut, k_box = jax.random.split(key, 5)
        h, w = x.shape[-2], x.shape[-1]

        do_mix = jax.random.uniform(k_prob) < self.mix_prob
        use_cutmix = jax.random.uniform(k_switch) < self.switch_prob
        lam_mixup = jax.random.beta(k_lam_mix, self.mixup_alpha, self.mixup_alpha)
        lam_cutmix = jax.random.beta(k_lam_cut, self.cutmix_alpha, self.cutmix_alpha)

        x_flip = jnp.flip(x, 0)

        # mixup branch value
        lam_m = jnp.where(do_mix, lam_mixup, 1.0)
        x_mixup = x * lam_m + x_flip * (1.0 - lam_m)

        # cutmix branch value (coordinate mask instead of dynamic slicing)
        yl, yh, xl, xh = _rand_bbox(k_box, h, w, lam_cutmix)
        row = jnp.arange(h)[:, None]
        col = jnp.arange(w)[None, :]
        box = ((row >= yl) & (row < yh) & (col >= xl) & (col < xh)).astype(x.dtype)
        box = box[None, None, None]  # (1,1,1,H,W)
        x_cutmix = x * (1.0 - box) + x_flip * box
        lam_c = 1.0 - ((yh - yl) * (xh - xl)).astype(jnp.float32) / float(h * w) \
            if self.correct_lam else lam_cutmix
        lam_c = jnp.where(do_mix, lam_c, 1.0)

        x_out = jnp.where(use_cutmix & do_mix, x_cutmix, x_mixup)
        lam = jnp.where(use_cutmix, lam_c, lam_m)
        y_out = mixup_target(target, self.num_classes, lam, self.label_smoothing)
        return x_out, y_out
