"""ViViT, TPU-native.

Re-design of reference video_transformer.py:270-556 ("ViViT: A Video Vision
Transformer", arXiv:2103.15691) as a flax.linen module.

Parity notes (citations into /root/reference/video_transformer.py):
- Conv3d tubelet embedding, ``tube_size=2``; the model operates on
  ``num_frames // tube_size`` effective frames (:323, :339-345).
- attention types: fact_encoder (Model-2), joint_space_time (Model-1),
  divided_space_time (Model-3) (:295-297, :348-398).
- fact_encoder: 12-layer spatial transformer over per-frame tokens, then a
  4-layer temporal transformer (``num_time_transformer_layers=4``, :377) over
  per-frame features; per-frame patch tokens are mean-pooled (:509-525).
- The fact_encoder forward takes ``x[:b, 0]`` as the cls row fed to the
  temporal stack (:515). For batch>1 those rows belong to sample 0's first b
  frames — we reproduce this reference behavior exactly because published
  checkpoints and the ThreeCrop demo parity depend on it.
- pos_embed has P+1 slots and time_embed T'+1 slots for fact_encoder (:405-407).
- final LayerNorm eps=1e-6 (:401).
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from videotransformer_tpu.ops import initializers as init
from videotransformer_tpu.ops.blocks import (
    PatchEmbed,
    TransformerContainer,
    get_sine_cosine_pos_emb,
)

Dtype = Any

SUPPORTED_ATTENTION_TYPES = ("fact_encoder", "joint_space_time", "divided_space_time")


class ViViT(nn.Module):
    num_frames: int
    img_size: int = 224
    patch_size: int = 16
    embed_dims: int = 768
    num_heads: int = 12
    num_transformer_layers: int = 12
    in_channels: int = 3
    dropout_p: float = 0.0
    tube_size: int = 2
    conv_type: str = "Conv3d"
    attention_type: str = "fact_encoder"
    use_learnable_pos_emb: bool = True
    return_cls_token: bool = True
    num_time_transformer_layers: int = 4
    drop_path_rate: float = 0.1
    remat: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        assert self.attention_type in SUPPORTED_ATTENTION_TYPES, (
            f"Unsupported Attention Type {self.attention_type}!"
        )
        # effective frames after tubelet embedding (video_transformer.py:323)
        self.eff_frames = self.num_frames // self.tube_size

        self.patch_embed = PatchEmbed(
            img_size=self.img_size,
            patch_size=self.patch_size,
            in_channels=self.in_channels,
            embed_dims=self.embed_dims,
            tube_size=self.tube_size,
            conv_type=self.conv_type,
            dtype=self.dtype,
        )
        num_patches = self.patch_embed.num_patches

        if self.attention_type == "divided_space_time":
            self.operator_order = ("time_attn", "space_attn", "ffn")
            self.transformer_layers = TransformerContainer(
                num_transformer_layers=self.num_transformer_layers,
                embed_dims=self.embed_dims,
                num_heads=self.num_heads,
                num_frames=self.eff_frames,
                hidden_channels=self.embed_dims * 4,
                operator_order=self.operator_order,
                drop_path_rate=self.drop_path_rate,
                remat=self.remat,
                dtype=self.dtype,
            )
        elif self.attention_type == "joint_space_time":
            self.operator_order = ("self_attn", "ffn")
            self.transformer_layers = TransformerContainer(
                num_transformer_layers=self.num_transformer_layers,
                embed_dims=self.embed_dims,
                num_heads=self.num_heads,
                num_frames=self.eff_frames,
                hidden_channels=self.embed_dims * 4,
                operator_order=self.operator_order,
                drop_path_rate=self.drop_path_rate,
                remat=self.remat,
                dtype=self.dtype,
            )
        else:  # fact_encoder
            self.operator_order = ("self_attn", "ffn")
            self.spatial_transformer = TransformerContainer(
                num_transformer_layers=self.num_transformer_layers,
                embed_dims=self.embed_dims,
                num_heads=self.num_heads,
                num_frames=self.eff_frames,
                hidden_channels=self.embed_dims * 4,
                operator_order=("self_attn", "ffn"),
                drop_path_rate=self.drop_path_rate,
                remat=self.remat,
                dtype=self.dtype,
            )
            self.temporal_transformer = TransformerContainer(
                num_transformer_layers=self.num_time_transformer_layers,
                embed_dims=self.embed_dims,
                num_heads=self.num_heads,
                num_frames=self.eff_frames,
                hidden_channels=self.embed_dims * 4,
                operator_order=("self_attn", "ffn"),
                drop_path_rate=self.drop_path_rate,
                remat=self.remat,
                dtype=self.dtype,
            )

        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.cls_token = self.param(
            "cls_token", init.trunc_normal_init(std=0.02), (1, 1, self.embed_dims)
        )

        n_frames = self.eff_frames
        n_patches = num_patches
        if self.attention_type == "fact_encoder":
            n_frames += 1
            n_patches += 1
            self.use_cls_token_temporal = False
        else:
            self.use_cls_token_temporal = self.operator_order[-2] == "time_attn"
            if self.use_cls_token_temporal:
                n_frames += 1
            else:
                n_patches += 1

        if self.use_learnable_pos_emb:
            self.pos_embed = self.param(
                "pos_embed", init.trunc_normal_init(std=0.02), (1, n_patches, self.embed_dims)
            )
            self.time_embed = self.param(
                "time_embed", init.trunc_normal_init(std=0.02), (1, n_frames, self.embed_dims)
            )
        else:
            self.pos_embed = get_sine_cosine_pos_emb(n_patches, self.embed_dims)
            self.time_embed = get_sine_cosine_pos_emb(n_frames, self.embed_dims)
        self.pos_drop = nn.Dropout(self.dropout_p)
        self.time_drop = nn.Dropout(self.dropout_p)

    def prepare_tokens(self, x, deterministic=True):
        """video_transformer.py:455-502. x: (b, t, c, h, w)."""
        b = x.shape[0]
        x = self.patch_embed(x)  # (b*t', p, d)
        bt, p, d = x.shape
        t = self.eff_frames

        pos_embed = jnp.asarray(self.pos_embed, dtype=x.dtype)
        cls_tok = jnp.broadcast_to(self.cls_token.astype(x.dtype), (bt, 1, d))
        if self.use_cls_token_temporal:
            x = x + pos_embed
            x = jnp.concatenate([cls_tok, x], axis=1)
        else:
            x = jnp.concatenate([cls_tok, x], axis=1)
            x = x + pos_embed
        x = self.pos_drop(x, deterministic=deterministic)

        if self.attention_type != "fact_encoder":
            time_embed = jnp.asarray(self.time_embed, dtype=x.dtype)
            cls_tokens = x[:b, :1, :]
            if self.use_cls_token_temporal:
                patches = x[:, 1:, :]
                patches = (
                    patches.reshape(b, t, p, d).transpose(0, 2, 1, 3).reshape(b * p, t, d)
                )
                cls_rep = jnp.broadcast_to(cls_tokens[:, None, :, :], (b, p, 1, d))
                cls_rep = cls_rep.reshape(b * p, 1, d)
                patches = jnp.concatenate([cls_rep, patches], axis=1)
                patches = patches + time_embed
                cls_tokens = patches[:b, :1, :]
                patches = patches[:, 1:, :].reshape(b, p * t, d)
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

        if self.attention_type != "fact_encoder":
            if return_attention:
                return self.transformer_layers(
                    x, deterministic=deterministic, return_attention=True
                )
            x = self.transformer_layers(x, deterministic=deterministic)
        else:
            x = self.spatial_transformer(x, deterministic=deterministic)
            bt, p1, d = x.shape
            t = self.eff_frames
            # reference video_transformer.py:515 takes the FIRST b rows as the
            # cls tokens (a quirk we reproduce; see module docstring)
            cls_tokens = x[:b, :1, :]
            patches = x[:, 1:, :].reshape(b, t, p1 - 1, d).mean(axis=2)  # b t d
            x = jnp.concatenate([cls_tokens, patches], axis=1)
            x = x + jnp.asarray(self.time_embed, dtype=x.dtype)
            x = self.time_drop(x, deterministic=deterministic)
            if return_attention:
                return self.temporal_transformer(
                    x, deterministic=deterministic, return_attention=True
                )
            x = self.temporal_transformer(x, deterministic=deterministic)

        x = self.norm(x)
        if self.return_cls_token:
            return x[:, 0]
        return x[:, 1:].mean(axis=1)

    def get_last_selfattention(self, x):
        return self(x, deterministic=True, return_attention=True)
