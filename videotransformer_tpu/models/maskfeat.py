"""MaskFeat: masked HOG-prediction pretraining on an MViT trunk.

Re-design of reference video_transformer.py:803-922:
- Conv3d patch embed k=(3,7,7) s=(2,4,4) p=(1,3,3) (:816-818, :834-843),
  xavier-uniform on the flattened kernel (:860-861).
- mask-token substitution after patch embed with nearest-neighbor upsample of
  the (T', 14, 14) cube mask by ``downsample_rate`` and convex mix
  ``x*(1-w) + mask_token*w`` (:911-919).
- decoder Linear(embed_dims -> feature_dim=2*2*2*3*9=216) (:855), predictions
  reshaped ``b (t h w) (dt dc) -> b (t dt) h w dc`` (:882-886).
- loss: MSE on masked positions of cube-CENTER frames only; the ragged
  cube_marker list becomes a padded (B, M, 2) + count tensor so the whole loss
  is a static-shape one-hot scatter (center = 2*start + span, :888-901).

``forward_features`` doubles as the supervised-mvit backbone
(model_trainer.py:203-204 uses ``forward_features(x)[:, 0]``).
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from videotransformer_tpu.models.mvit import create_multiscale_vision_transformers
from videotransformer_tpu.ops import initializers as init

Dtype = Any


class MaskFeat(nn.Module):
    img_size: int = 224
    num_frames: int = 16
    input_channels: int = 3
    feature_dim: int = 2 * 2 * 2 * 3 * 9
    patch_embed_dim: int = 96
    conv_patch_embed_kernel: Tuple[int, int, int] = (3, 7, 7)
    conv_patch_embed_stride: Tuple[int, int, int] = (2, 4, 4)
    conv_patch_embed_padding: Tuple[int, int, int] = (1, 3, 3)
    embed_dim_mul: Tuple = ((1, 2.0), (3, 2.0), (14, 2.0))
    atten_head_mul: Tuple = ((1, 2.0), (3, 2.0), (14, 2.0))
    pool_q_stride_size: Tuple = ((1, 1, 2, 2), (3, 1, 2, 2), (14, 1, 2, 2))
    pool_kv_stride_adaptive: Tuple[int, int, int] = (1, 8, 8)
    pool_kvq_kernel: Tuple[int, int, int] = (3, 3, 3)
    depth: int = 16
    dtype: Dtype = jnp.float32

    @property
    def downsample_rate(self) -> int:
        return 2 ** len(self.pool_q_stride_size)

    @property
    def embed_dims(self) -> int:
        return 2 ** len(self.embed_dim_mul) * self.patch_embed_dim

    def setup(self):
        self.stride = self.conv_patch_embed_stride
        self.patch_embed = nn.Conv(
            self.patch_embed_dim,
            kernel_size=tuple(self.conv_patch_embed_kernel),
            strides=tuple(self.conv_patch_embed_stride),
            padding=[(p, p) for p in self.conv_patch_embed_padding],
            dtype=self.dtype,
            kernel_init=init.xavier_uniform_flat(),
            bias_init=init.zeros_init,
            name="patch_embed",
        )
        self.mvit, final_dim = create_multiscale_vision_transformers(
            spatial_size=self.img_size,
            temporal_size=self.num_frames,
            embed_dim_mul=[list(x) for x in self.embed_dim_mul],
            atten_head_mul=[list(x) for x in self.atten_head_mul],
            pool_q_stride_size=[list(x) for x in self.pool_q_stride_size],
            pool_kv_stride_adaptive=list(self.pool_kv_stride_adaptive),
            pool_kvq_kernel=list(self.pool_kvq_kernel),
            depth=self.depth,
            patch_embed_dim=self.patch_embed_dim,
            conv_patch_embed_stride=self.conv_patch_embed_stride,
            dtype=self.dtype,
        )
        self.decoder_pred = nn.Dense(
            self.feature_dim, dtype=self.dtype,
            kernel_init=init.xavier_uniform_flat(),
            bias_init=init.zeros_init,
            name="decoder_pred")
        self.mask_token = self.param(
            "mask_token", init.trunc_normal_init(std=0.02),
            (1, 1, self.patch_embed_dim))

    def forward_features(self, x, mask=None, deterministic: bool = True):
        """x (B, T, C, H, W); mask (B, T', 14, 14) or None.

        reference video_transformer.py:911-922.
        """
        b, t, c, h, w = x.shape
        x = x.transpose(0, 1, 3, 4, 2)  # NDHWC
        x = self.patch_embed(x)  # (B, T', H', W', 96)
        bt, tt, hh, ww, d = x.shape
        x = x.reshape(b, tt * hh * ww, d)

        if mask is not None:
            dr = self.downsample_rate
            dense_mask = jnp.repeat(jnp.repeat(mask, dr, axis=2), dr, axis=3)
            w_mask = dense_mask.reshape(b, -1, 1).astype(x.dtype)
            mask_token = self.mask_token.astype(x.dtype)
            x = x * (1 - w_mask) + mask_token * w_mask

        return self.mvit(x, deterministic=deterministic)

    def __call__(self, x, target_x=None, mask=None, cube_marker=None,
                 cube_count=None, deterministic: bool = True, visualize: bool = False):
        """Pretraining forward: returns (preds, loss) like the reference.

        cube_marker: (B, M, 2) int [start, span] padded; cube_count: (B,).
        """
        feats = self.forward_features(x, mask, deterministic=deterministic)
        preds = self.decoder_pred(feats)
        preds = preds[:, 1:, :]

        t_out = self.num_frames // self.stride[0]
        h_out = self.img_size // (self.stride[1] * self.downsample_rate)
        w_out = self.img_size // (self.stride[2] * self.downsample_rate)
        dt = self.stride[0]
        dc = self.feature_dim // dt
        # b (t h w) (dt dc) -> b (t dt) h w dc
        preds = preds.reshape(-1, t_out, h_out, w_out, dt, dc)
        preds = preds.transpose(0, 1, 4, 2, 3, 5)
        preds = preds.reshape(-1, t_out * dt, h_out, w_out, dc)

        if target_x is None:
            return preds

        # center-frame mask (video_transformer.py:888-897): for each cube
        # marker, only the frame at 2*start + span (== start*dt + span*dt//2)
        # keeps its mask; everything else is zeroed.
        b = preds.shape[0]
        T16 = t_out * dt
        mask16 = jnp.repeat(mask, dt, axis=1).astype(jnp.float32)  # (B, 16, h, w)
        if cube_marker is not None:
            starts = cube_marker[..., 0]
            spans = cube_marker[..., 1]
            centers = starts * dt + spans * dt // 2  # (B, M)
            m_idx = jnp.arange(cube_marker.shape[1])[None, :]
            valid = (m_idx < cube_count[:, None]).astype(jnp.float32)
            center_onehot = jax.nn.one_hot(centers, T16) * valid[..., None]
            center_mask = jnp.clip(center_onehot.sum(axis=1), 0, 1)  # (B, T16)
            mask16 = mask16 * center_mask[:, :, None, None]

        loss = (preds.astype(jnp.float32) - target_x.astype(jnp.float32)) ** 2
        loss = loss.mean(axis=-1)
        loss = (loss * mask16).sum() / (mask16.sum() + 1e-5)

        if visualize:
            # HOG-prediction maps (reference video_transformer.py:904-907):
            # unfold each 14x14 token cell into its 2x2 spatial sub-cells and
            # 3-channel x 9-orientation histogram -> (B, T16, 28, 28, 3, 9)
            hp = preds.reshape(b, T16, h_out, w_out, 2, 2, 3, 9)
            hog_preds = hp.transpose(0, 1, 2, 4, 3, 5, 6, 7).reshape(
                b, T16, h_out * 2, w_out * 2, 3, 9)
            return preds, loss, mask16, hog_preds
        return preds, loss
