"""TimeSformer, TPU-native.

Re-design of reference video_transformer.py:20-268 ("Is Space-Time Attention All
You Need for Video Understanding?", arXiv:2102.05095) as a flax.linen module.

Parity notes (citations into /root/reference/video_transformer.py):
- attention types: divided_space_time / space_only / joint_space_time (:45-47).
- separate learnable spatial ``pos_embed`` (1, P(+1), D) and temporal
  ``time_embed`` (1, T(+1), D) (:129-142); sinusoidal tables when
  ``use_learnable_pos_emb=False``.
- ``use_cls_token_temporal = operator_order[-2] == 'time_attn'`` (:123-127) —
  False for the default ['time_attn','space_attn','ffn'] order, so the cls token
  gets the spatial pos embedding and skips the temporal one.
- token pipeline ``prepare_tokens`` (:193-240): patch embed -> +cls -> +pos ->
  fold to (b p) t d -> +time -> flat patch-major ``b (p t) d`` sequence.
- bicubic ``interpolate_pos_encoding`` for non-224 resolutions (:171-191).
- final LayerNorm eps=1e-6 (:119); cls token (or patch mean) readout (:253-256).
- space_only averages frame features after the spatial-only stack (:247-249).

The forward is a single jit-able function of (params, video); dropout/droppath
use the 'dropout' rng collection during training.
"""

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from videotransformer_tpu.ops import initializers as init
from videotransformer_tpu.ops.blocks import (
    PatchEmbed,
    TransformerContainer,
    get_sine_cosine_pos_emb,
)

Dtype = Any

SUPPORTED_ATTENTION_TYPES = ("divided_space_time", "space_only", "joint_space_time")


def interpolate_pos_encoding(pos_embed, npatch, w, h, patch_size):
    """Bicubic-resize the patch position table for arbitrary resolution.

    Mirrors reference video_transformer.py:171-191 (DINO-style). ``pos_embed``
    is (1, N+1, D) including the cls slot.
    """
    N = pos_embed.shape[1] - 1
    if npatch == N and w == h:
        return pos_embed
    class_pos = pos_embed[:, :1]
    patch_pos = pos_embed[:, 1:]
    dim = pos_embed.shape[-1]
    w0 = w // patch_size
    h0 = h // patch_size
    side = int(math.sqrt(N))
    patch_pos = patch_pos.reshape(1, side, side, dim)
    patch_pos = jax.image.resize(
        patch_pos, (1, w0, h0, dim), method="bicubic"
    )
    patch_pos = patch_pos.reshape(1, w0 * h0, dim)
    return jnp.concatenate([class_pos, patch_pos], axis=1)


class TimeSformer(nn.Module):
    num_frames: int
    img_size: int = 224
    patch_size: int = 16
    embed_dims: int = 768
    num_heads: int = 12
    num_transformer_layers: int = 12
    in_channels: int = 3
    conv_type: str = "Conv2d"
    dropout_p: float = 0.0
    attention_type: str = "divided_space_time"
    use_learnable_pos_emb: bool = True
    return_cls_token: bool = True
    drop_path_rate: float = 0.1
    remat: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        assert self.attention_type in SUPPORTED_ATTENTION_TYPES, (
            f"Unsupported Attention Type {self.attention_type}!"
        )
        self.patch_embed = PatchEmbed(
            img_size=self.img_size,
            patch_size=self.patch_size,
            in_channels=self.in_channels,
            embed_dims=self.embed_dims,
            conv_type=self.conv_type,
            dtype=self.dtype,
        )
        num_patches = self.patch_embed.num_patches

        if self.attention_type == "divided_space_time":
            self.operator_order = ("time_attn", "space_attn", "ffn")
        else:
            self.operator_order = ("self_attn", "ffn")
        self.transformer_layers = TransformerContainer(
            num_transformer_layers=self.num_transformer_layers,
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            num_frames=self.num_frames,
            hidden_channels=self.embed_dims * 4,
            operator_order=self.operator_order,
            drop_path_rate=self.drop_path_rate,
            remat=self.remat,
            dtype=self.dtype,
        )
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)

        self.cls_token = self.param(
            "cls_token", init.trunc_normal_init(std=0.02), (1, 1, self.embed_dims)
        )
        # whether one cls slot lives in the temporal table (video_transformer.py:123-127)
        self.use_cls_token_temporal = self.operator_order[-2] == "time_attn"
        n_frames = self.num_frames
        n_patches = num_patches
        if self.use_cls_token_temporal:
            n_frames += 1
        else:
            n_patches += 1

        if self.use_learnable_pos_emb:
            self.pos_embed = self.param(
                "pos_embed", init.trunc_normal_init(std=0.02), (1, n_patches, self.embed_dims)
            )
        else:
            self.pos_embed = get_sine_cosine_pos_emb(n_patches, self.embed_dims)
        if self.attention_type != "space_only":
            if self.use_learnable_pos_emb:
                self.time_embed = self.param(
                    "time_embed", init.trunc_normal_init(std=0.02), (1, n_frames, self.embed_dims)
                )
            else:
                self.time_embed = get_sine_cosine_pos_emb(n_frames, self.embed_dims)
        self.pos_drop = nn.Dropout(self.dropout_p)
        self.time_drop = nn.Dropout(self.dropout_p)

    def prepare_tokens(self, x, deterministic=True):
        """video_transformer.py:193-240. x: (b, t, c, h, w) -> (b*, n, d), b."""
        b, t, c, h, w = x.shape
        x = self.patch_embed(x)  # (b*t, p, d)
        bt, p, d = x.shape

        pos_embed = jnp.asarray(self.pos_embed, dtype=x.dtype)
        cls_tok = jnp.broadcast_to(self.cls_token.astype(x.dtype), (bt, 1, d))
        if self.use_cls_token_temporal:
            x = x + pos_embed
            x = jnp.concatenate([cls_tok, x], axis=1)
        else:
            x = jnp.concatenate([cls_tok, x], axis=1)
            x = x + interpolate_pos_encoding(pos_embed, p, w, h, self.patch_size)
        x = self.pos_drop(x, deterministic=deterministic)

        if self.attention_type != "space_only":
            time_embed = jnp.asarray(self.time_embed, dtype=x.dtype)
            # all cls rows are identical here; the reference takes the first b
            cls_tokens = x[:b, :1, :]
            if self.use_cls_token_temporal:
                # (b t) p d -> (b p) t d, with the cls slot going through the
                # temporal table (video_transformer.py:217-229)
                patches = x[:, 1:, :]
                patches = (
                    patches.reshape(b, t, p, d).transpose(0, 2, 1, 3).reshape(b * p, t, d)
                )
                cls_rep = jnp.broadcast_to(cls_tokens[:, None, :, :], (b, p, 1, d))
                cls_rep = cls_rep.reshape(b * p, 1, d)
                patches = jnp.concatenate([cls_rep, patches], axis=1)
                patches = patches + time_embed
                cls_tokens = patches[:b, :1, :]
                patches = patches[:, 1:, :]
                patches = patches.reshape(b, p, t, d).reshape(b, p * t, d)
                x = jnp.concatenate([cls_tokens, patches], axis=1)
            else:
                patches = x[:, 1:, :]
                patches = (
                    patches.reshape(b, t, p, d).transpose(0, 2, 1, 3).reshape(b * p, t, d)
                )
                patches = patches + time_embed
                patches = patches.reshape(b, p * t, d)
                x = jnp.concatenate([cls_tokens, patches], axis=1)
            x = self.time_drop(x, deterministic=deterministic)

        return x, b

    def __call__(self, x, deterministic: bool = True, return_attention: bool = False):
        x, b = self.prepare_tokens(x, deterministic=deterministic)
        if return_attention:
            return self.transformer_layers(
                x, deterministic=deterministic, return_attention=True
            )
        x = self.transformer_layers(x, deterministic=deterministic)

        if self.attention_type == "space_only":
            bt, p, d = x.shape
            x = x.reshape(b, bt // b, p, d).mean(axis=1)

        x = self.norm(x)
        if self.return_cls_token:
            return x[:, 0]
        return x[:, 1:].mean(axis=1)

    def get_last_selfattention(self, x):
        return self(x, deterministic=True, return_attention=True)


def get_vit_base_patch16_224(**kwargs):
    """TimeSformer-B/16 builder (video_transformer.py:263-268)."""
    return TimeSformer(
        num_frames=kwargs["num_frames"],
        img_size=kwargs.get("img_size", 224),
        attention_type=kwargs.get("attention_type", "divided_space_time"),
        patch_size=16,
        embed_dims=768,
        num_heads=12,
        in_channels=3,
        num_transformer_layers=12,
        conv_type="Conv2d",
        dropout_p=0.0,
        use_learnable_pos_emb=True,
        return_cls_token=True,
        dtype=kwargs.get("dtype", jnp.float32),
    )
