"""Multiscale Vision Transformers (MViT), TPU-native from scratch.

The reference imports MViT from pytorchvideo (video_transformer.py:15-17,
754-800); per SURVEY §2.3 we implement pooling attention natively. Semantics
follow the pytorchvideo layers the reference pins, with citations to the
reference's builder where it configures them:

- ``MultiScaleAttention``: fused-QKV attention where Q/K/V are depthwise-conv
  pooled per head channel (kernel 3x3x3, stride schedule), each followed by a
  LayerNorm over head_dim. attn = softmax(q*scale @ k^T) @ v (MViT v1, no
  residual pooling — the reference leaves ``residual_pool`` commented out,
  video_transformer.py:781).
- ``MultiScaleBlock``: prenorm attention with a MaxPool3d skip path when Q is
  strided (kernel = stride+1, padding = kernel//2), MLP with dim expansion
  (dim -> dim_out at fc2) and a Linear residual projection when dim != dim_out.
- ``SpatioTemporalClsPositionalEncoding`` with ``sep_pos_embed=True``
  (video_transformer.py:693-698): spatial table tiled over T + temporal table
  repeat-interleaved over H*W + class slot.
- ``create_multiscale_vision_transformers`` (video_transformer.py:621-800):
  16-deep MViT-B; dim/head multipliers [[1,2],[3,2],[14,2]] via ``round_width``
  with head-divisor rounding; Q-stride schedule with adaptive KV strides
  ([1,8,8] divided by Q strides as depth increases, video_transformer.py:732-742).

All pooling convs/maxpools run in NDHWC layout (lax conv/reduce_window) so XLA
maps them onto TPU conv units; token <-> (T,H,W) reshapes are pure reshapes.
LayerNorm eps=1e-6 throughout (video_transformer.py:668-671).
"""

import math
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from videotransformer_tpu import config as vt_config
from videotransformer_tpu.ops import initializers as init

Dtype = Any


def round_width(width, multiplier, min_width=1, divisor=1, ceil=False):
    """pytorchvideo round_width (used at video_transformer.py:755-761)."""
    if not multiplier:
        return width
    width *= multiplier
    min_width = min_width or divisor
    if ceil:
        width_out = max(min_width, int(math.ceil(width / divisor)) * divisor)
    else:
        width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if width_out < 0.9 * width:
        width_out += divisor
    return int(width_out)


def _maxpool3d(x, kernel, stride, padding):
    """x (B, T, H, W, C); torch MaxPool3d(ceil_mode=False) semantics."""
    dims = (1, *kernel, 1)
    strides = (1, *stride, 1)
    pads = ((0, 0), *[(p, p) for p in padding], (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, dims, strides, pads)


class _DepthwiseKernel(nn.Module):
    """Holds the (k, k, k, 1, head_dim) depthwise kernel under the same
    ``conv/kernel`` parameter path nn.Conv would use, so checkpoints and the
    torch converter are unchanged by the tiled-apply optimization below."""

    head_dim: int
    kernel: Tuple[int, int, int]

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", init.trunc_normal_init(std=0.02),
            (*self.kernel, 1, self.head_dim))


class _PoolConv(nn.Module):
    """Depthwise Conv3d(head_dim, head_dim, k, s, p, groups=head_dim, bias=False).

    pytorchvideo applies ONE head_dim-channel depthwise conv to every head
    (it folds (B, H, L, hd) to (B*H, hd, T, H, W) first). We instead run a
    single C=(H*hd)-channel depthwise conv on the unsplit (B, T, H, W, C)
    tensor with the head_dim kernel tiled across heads — identical math
    (each channel sees its own window with the same per-head_dim weights),
    full 8x128 lane tiles instead of hd=96, and no head-axis relayout before
    pooling. The stored parameter keeps the (k, k, k, 1, head_dim) shape.
    """

    head_dim: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, T, H, W, C) with C a multiple of head_dim
        C = x.shape[-1]
        w = _DepthwiseKernel(self.head_dim, tuple(self.kernel), name="conv")()
        w = jnp.tile(w.astype(self.dtype), (1, 1, 1, 1, C // self.head_dim))
        pad = [(k // 2, k // 2) for k in self.kernel]
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w,
            window_strides=tuple(self.stride), padding=pad,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=C)


def _split_cls(tensor, has_cls):
    if has_cls:
        return tensor[..., :1, :], tensor[..., 1:, :]
    return None, tensor


class MultiScaleAttention(nn.Module):
    """Pooling attention.

    Internally the cls token rides as a SEPARATE (B, 1, C) tensor next to the
    (B, L, C) patch tokens ("split-cls layout"): pytorchvideo's
    ``_attention_pool`` slices the cls row off the concatenated sequence and
    concatenates it back around every Q/K/V pool — on TPU each of those is a
    full relayout copy of the sequence (sublane offset 1), ~16 blocks x 3
    tensors per step. In split form the pools touch only the patch tensor,
    cls joins the (up to 64x smaller) POOLED K/V via a cheap concat, and the
    single cls query row gets its own trivial (1, Nkv) attention. The math
    (and every parameter path) is identical to the concatenated form.

    ``__call__`` keeps the concatenated (B, 1+L, C) API; the block stack uses
    ``split_io=True`` to stay in split layout end to end.
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    kernel_q: Tuple[int, ...] = ()
    kernel_kv: Tuple[int, ...] = ()
    stride_q: Tuple[int, ...] = ()
    stride_kv: Tuple[int, ...] = ()
    has_cls_embed: bool = True
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    def _pool(self, cls_tok, t, thw, pool_mod, norm_name):
        """pytorchvideo _attention_pool in split-cls layout, run in the
        full-channel (B, L, C) layout BEFORE the head split (see _PoolConv):
        the pooling conv touches one contiguous-channel tensor and the
        head-axis transpose happens after pooling on the (up to 64x)
        smaller pooled sequence. The per-head LayerNorm (param shape
        (head_dim,), same path) is applied through a free reshape — to the
        patch tokens and the cls token separately (per-token op, identical
        to norming the concatenated sequence)."""
        if pool_mod is None:
            return cls_tok, t, thw
        B, L, C = t.shape
        hd = C // self.num_heads
        T, Hh, Ww = thw
        t = t.reshape(B, T, Hh, Ww, C)
        t = pool_mod(t)
        new_thw = (t.shape[1], t.shape[2], t.shape[3])
        t = t.reshape(B, -1, C)
        norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=norm_name)

        def per_head_norm(u):
            return norm(u.reshape(B, u.shape[1], self.num_heads, hd)
                        ).reshape(B, u.shape[1], C)

        t = per_head_norm(t)
        if cls_tok is not None:
            cls_tok = per_head_norm(cls_tok)
        return cls_tok, t, new_thw

    @nn.compact
    def __call__(self, x, thw, deterministic: bool = True, *, x_cls=None,
                 split_io: bool = False):
        if not split_io:
            x_cls, x = _split_cls(x, self.has_cls_embed)
        B = x.shape[0]
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5

        qkv_mod = nn.Dense(
            self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
            kernel_init=init.trunc_normal_init(std=0.02),
            bias_init=init.zeros_init, name="qkv")
        qkv = qkv_mod(x)
        qkv_cls = qkv_mod(x_cls) if x_cls is not None else None
        # split q/k/v by LANE slices rather than the torch-style
        # reshape(B,N,3,H,hd).transpose(2,0,3,1,4): the 5-D transpose is a
        # full relayout of the (B,N,3C) tensor (1.5 ms/call at stage 0 of the
        # batch-8 MaskFeat step); slicing keeps the feature dim minor, and
        # the head split happens AFTER pooling so the transpose acts on the
        # pooled (up to 64x smaller) sequence
        C_ = self.dim

        def head_split(t):
            return t.reshape(B, t.shape[1], self.num_heads, head_dim
                             ).transpose(0, 2, 1, 3)

        has_q_pool = len(self.kernel_q) > 0 and int(np.prod(self.kernel_q)) > 0
        has_kv_pool = len(self.kernel_kv) > 0 and int(np.prod(self.kernel_kv)) > 0

        pool_q = (
            _PoolConv(head_dim, tuple(self.kernel_q), tuple(self.stride_q),
                      dtype=self.dtype, name="pool_q")
            if has_q_pool else None)
        pool_k = (
            _PoolConv(head_dim, tuple(self.kernel_kv), tuple(self.stride_kv),
                      dtype=self.dtype, name="pool_k")
            if has_kv_pool else None)
        pool_v = (
            _PoolConv(head_dim, tuple(self.kernel_kv), tuple(self.stride_kv),
                      dtype=self.dtype, name="pool_v")
            if has_kv_pool else None)

        def part(t, i):
            return None if t is None else t[..., i * C_:(i + 1) * C_]

        q_cls, q, q_thw = self._pool(
            part(qkv_cls, 0), qkv[..., :C_], thw, pool_q, "norm_q")
        k_cls, k, _ = self._pool(
            part(qkv_cls, 1), qkv[..., C_:2 * C_], thw, pool_k, "norm_k")
        v_cls, v, _ = self._pool(
            part(qkv_cls, 2), qkv[..., 2 * C_:], thw, pool_v, "norm_v")

        # cls key/value join the pooled K/V (order matches the reference's
        # [cls, pooled] concat); this concat is on the small pooled sequence
        if k_cls is not None:
            k = jnp.concatenate([k_cls, k], axis=1)
            v = jnp.concatenate([v_cls, v], axis=1)
        qh, kh, vh = head_split(q), head_split(k), head_split(v)

        if not self.is_initializing() and vt_config.use_pallas_attention():
            # Pallas flash kernel handles Nq != Nkv (pooled K/V); the q-blocked
            # backward never materializes the (Nq, Nkv) matrix in HBM — the
            # same fusion win the TimeSformer path gets from fused_mhsa.
            from videotransformer_tpu.kernels.flash_attention_pallas import (
                flash_attention)

            out = flash_attention(qh, kh, vh, scale)
        else:
            attn = jnp.einsum(
                "bhnd,bhmd->bhnm", qh * scale, kh,
                preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum(
                "bhnm,bhmd->bhnd", attn, vh, preferred_element_type=jnp.float32
            ).astype(self.dtype)
        Nq = out.shape[2]
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, C_)

        out_cls = None
        if q_cls is not None:
            # the single cls query row: a (1, Nkv) attention — plain XLA math
            # (same fp32-softmax numerics as the fallback path above)
            qc = head_split(q_cls)
            s = jnp.einsum(
                "bhnd,bhmd->bhnm", qc * scale, kh,
                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s, axis=-1).astype(self.dtype)
            oc = jnp.einsum(
                "bhnm,bhmd->bhnd", p, vh, preferred_element_type=jnp.float32
            ).astype(self.dtype)
            out_cls = oc.transpose(0, 2, 1, 3).reshape(B, 1, C_)

        proj = nn.Dense(
            self.dim, dtype=self.dtype,
            kernel_init=init.trunc_normal_init(std=0.02),
            bias_init=init.zeros_init, name="proj")
        drop = nn.Dropout(self.dropout_rate)
        out = drop(proj(out), deterministic=deterministic)
        if out_cls is not None:
            out_cls = drop(proj(out_cls), deterministic=deterministic)

        if split_io:
            return (out_cls, out), q_thw
        if out_cls is not None:
            out = jnp.concatenate([out_cls, out], axis=1)
        return out, q_thw


class MultiScaleBlock(nn.Module):
    dim: int
    dim_out: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dropout_rate: float = 0.0
    droppath_rate: float = 0.0
    kernel_q: Tuple[int, ...] = ()
    kernel_kv: Tuple[int, ...] = ()
    stride_q: Tuple[int, ...] = ()
    stride_kv: Tuple[int, ...] = ()
    has_cls_embed: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.attn = MultiScaleAttention(
            dim=self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            kernel_q=self.kernel_q, kernel_kv=self.kernel_kv,
            stride_q=self.stride_q, stride_kv=self.stride_kv,
            has_cls_embed=self.has_cls_embed, dropout_rate=self.dropout_rate,
            dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        hidden = int(self.dim * self.mlp_ratio)
        self.mlp_fc1 = nn.Dense(
            hidden, dtype=self.dtype,
            kernel_init=init.trunc_normal_init(std=0.02),
            bias_init=init.zeros_init)
        self.mlp_fc2 = nn.Dense(
            self.dim_out, dtype=self.dtype,
            kernel_init=init.trunc_normal_init(std=0.02),
            bias_init=init.zeros_init)
        if self.dim != self.dim_out:
            self.proj = nn.Dense(
                self.dim_out, dtype=self.dtype,
                kernel_init=init.trunc_normal_init(std=0.02),
                bias_init=init.zeros_init)
        self.mlp_drop = nn.Dropout(self.dropout_rate)

    def _droppath_pair(self, h, h_cls, deterministic):
        """Stochastic depth (reference transformer.py:34-42) applied with ONE
        per-sample keep mask shared by the patch and cls parts — in the
        concatenated form a single (B, 1, 1) draw scales the whole sequence,
        so the split form must reuse the same draw for both tensors."""
        if deterministic or self.droppath_rate == 0.0:
            return h, h_cls
        keep_prob = 1.0 - self.droppath_rate
        mask = jnp.floor(keep_prob + jax.random.uniform(
            self.make_rng("dropout"), (h.shape[0], 1, 1), dtype=h.dtype))
        h = h / keep_prob * mask
        if h_cls is not None:
            h_cls = h_cls / keep_prob * mask
        return h, h_cls

    def __call__(self, x, thw, deterministic: bool = True, *, x_cls=None,
                 split_io: bool = False):
        if not split_io:
            x_cls, x = _split_cls(x, self.has_cls_embed)
        xn = self.norm1(x)
        xn_cls = self.norm1(x_cls) if x_cls is not None else None
        (attn_cls, attn_out), thw_new = self.attn(
            xn, thw, deterministic, x_cls=xn_cls, split_io=True)

        # skip-path pooling when Q is strided (pytorchvideo pool_skip);
        # split-cls layout: the maxpool touches only the patch tensor
        if len(self.stride_q) > 0 and int(np.prod(self.stride_q)) > 1:
            kernel_skip = [s + 1 if s > 1 else s for s in self.stride_q]
            padding_skip = [int(k // 2) for k in kernel_skip]
            B, L, C = x.shape[0], x.shape[1], x.shape[2]
            T, Hh, Ww = thw
            t = x.reshape(B, T, Hh, Ww, C)
            t = _maxpool3d(t, kernel_skip, self.stride_q, padding_skip)
            x_res = t.reshape(B, -1, C)
        else:
            x_res = x

        attn_out, attn_cls = self._droppath_pair(
            attn_out, attn_cls, deterministic)
        x = x_res + attn_out
        if x_cls is not None:
            x_cls = x_cls + attn_cls

        from videotransformer_tpu import config as vt_config

        use_fused_mlp = (
            self.dim == self.dim_out  # residual proj needs norm2(x) anyway
            and self.dropout_rate == 0.0
            and not self.is_initializing()
            and vt_config.use_pallas_attention()
        )
        if use_fused_mlp:
            from videotransformer_tpu.kernels.fused_ffn_pallas import (
                fused_prenorm_ffn)

            np_ = self.norm2.variables["params"]
            p1 = self.mlp_fc1.variables["params"]
            p2 = self.mlp_fc2.variables["params"]

            def fused(t):
                return fused_prenorm_ffn(
                    t.astype(self.dtype),
                    np_["scale"].astype(self.dtype),
                    np_["bias"].astype(self.dtype),
                    p1["kernel"].astype(self.dtype),
                    p1["bias"].astype(self.dtype),
                    p2["kernel"].astype(self.dtype),
                    p2["bias"].astype(self.dtype),
                    1e-6)

            h = fused(x)
            # the single cls row goes through the same params as plain XLA
            # math (one token — not worth a kernel launch)
            if x_cls is not None:
                xc = self.norm2(x_cls)
                hc = self.mlp_fc2(nn.gelu(self.mlp_fc1(xc), approximate=False))
            else:
                hc = None
        else:
            x_norm2 = self.norm2(x)
            h = self.mlp_fc1(x_norm2)
            h = nn.gelu(h, approximate=False)
            h = self.mlp_drop(h, deterministic=deterministic)
            h = self.mlp_fc2(h)
            h = self.mlp_drop(h, deterministic=deterministic)
            if x_cls is not None:
                xc = self.norm2(x_cls)
                hc = self.mlp_fc1(xc)
                hc = nn.gelu(hc, approximate=False)
                hc = self.mlp_drop(hc, deterministic=deterministic)
                hc = self.mlp_fc2(hc)
                hc = self.mlp_drop(hc, deterministic=deterministic)
            else:
                hc = None
            if self.dim != self.dim_out:
                x = self.proj(x_norm2)
                if x_cls is not None:
                    x_cls = self.proj(xc)
        h, hc = self._droppath_pair(h, hc, deterministic)
        x = x + h
        if x_cls is not None:
            x_cls = x_cls + hc
        if split_io:
            return (x_cls, x), thw_new
        if x_cls is not None:
            x = jnp.concatenate([x_cls, x], axis=1)
        return x, thw_new


class SpatioTemporalClsPositionalEncoding(nn.Module):
    """sep_pos_embed=True variant (reference video_transformer.py:693-698)."""

    embed_dim: int
    patch_embed_shape: Tuple[int, int, int]  # (T, H, W)
    has_cls: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, split_io: bool = False):
        """x: (B, T*H*W, D) patch tokens. Returns the concatenated
        (B, 1+THW, D) sequence, or ``(cls, patches)`` when ``split_io``
        (the split-cls layout the block stack runs in)."""
        B = x.shape[0]
        T, H, W = self.patch_embed_shape
        pos_spatial = self.param(
            "pos_embed_spatial", init.trunc_normal_init(std=0.02),
            (1, H * W, self.embed_dim))
        pos_temporal = self.param(
            "pos_embed_temporal", init.trunc_normal_init(std=0.02),
            (1, T, self.embed_dim))
        cls = None
        if self.has_cls:
            cls_token = self.param(
                "cls_token", init.trunc_normal_init(std=0.02),
                (1, 1, self.embed_dim))
            pos_class = self.param(
                "pos_embed_class", init.trunc_normal_init(std=0.02),
                (1, 1, self.embed_dim))
            cls = jnp.broadcast_to(
                (cls_token + pos_class).astype(x.dtype),
                (B, 1, self.embed_dim))
        pos = jnp.tile(pos_spatial, (1, T, 1)) + jnp.repeat(
            pos_temporal, H * W, axis=1)
        x = x + pos.astype(x.dtype)
        if split_io:
            return cls, x
        if cls is not None:
            x = jnp.concatenate([cls, x], axis=1)
        return x


class MultiscaleVisionTransformers(nn.Module):
    """Block stack + positional encoding + final norm (builder below)."""

    embed_dim: int
    patch_embed_shape: Tuple[int, int, int]
    block_configs: Tuple[dict, ...]
    cls_embed_on: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # the whole trunk runs in split-cls layout (see MultiScaleAttention);
        # the cls token is concatenated back exactly once, at the output
        x_cls, x = SpatioTemporalClsPositionalEncoding(
            embed_dim=self.embed_dim,
            patch_embed_shape=self.patch_embed_shape,
            has_cls=self.cls_embed_on,
            dtype=self.dtype,
            name="cls_positional_encoding")(x, split_io=True)
        thw = tuple(self.patch_embed_shape)
        for i, cfg in enumerate(self.block_configs):
            (x_cls, x), thw = MultiScaleBlock(
                dtype=self.dtype, name=f"blocks_{i}", **cfg)(
                    x, thw, deterministic=deterministic, x_cls=x_cls,
                    split_io=True)
        if x_cls is not None:
            x = jnp.concatenate([x_cls, x], axis=1)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_embed")(x)
        return x


def build_mvit_block_configs(
    depth=16,
    num_heads=1,
    patch_embed_dim=96,
    mlp_ratio=4.0,
    qkv_bias=True,
    dropout_rate_block=0.0,
    droppath_rate_block=0.0,
    embed_dim_mul=None,
    atten_head_mul=None,
    pool_q_stride_size=None,
    pool_kv_stride_size=None,
    pool_kv_stride_adaptive=None,
    pool_kvq_kernel=None,
    has_cls=True,
):
    """Mirror of the reference's block-schedule construction
    (video_transformer.py:700-786). Returns (block_configs, final_embed_dim)."""
    dpr = list(np.linspace(0, droppath_rate_block, depth))

    dim_mul = np.ones(depth + 1)
    head_mul = np.ones(depth + 1)
    if embed_dim_mul is not None:
        for i, m in embed_dim_mul:
            dim_mul[i] = m
    if atten_head_mul is not None:
        for i, m in atten_head_mul:
            head_mul[i] = m

    pool_q = [[] for _ in range(depth)]
    pool_kv = [[] for _ in range(depth)]
    stride_q = [[] for _ in range(depth)]
    stride_kv = [[] for _ in range(depth)]

    if pool_q_stride_size is not None:
        for entry in pool_q_stride_size:
            i = entry[0]
            stride_q[i] = list(entry[1:])
            if pool_kvq_kernel is not None:
                pool_q[i] = list(pool_kvq_kernel)
            else:
                pool_q[i] = [s + 1 if s > 1 else s for s in entry[1:]]

    if pool_kv_stride_adaptive is not None:
        assert pool_kv_stride_size is None
        _stride_kv = list(pool_kv_stride_adaptive)
        pool_kv_stride_size = []
        for i in range(depth):
            if len(stride_q[i]) > 0:
                _stride_kv = [
                    max(_stride_kv[d] // stride_q[i][d], 1)
                    for d in range(len(_stride_kv))
                ]
            pool_kv_stride_size.append([i] + _stride_kv)

    if pool_kv_stride_size is not None:
        for entry in pool_kv_stride_size:
            i = entry[0]
            stride_kv[i] = list(entry[1:])
            if pool_kvq_kernel is not None:
                pool_kv[i] = list(pool_kvq_kernel)
            else:
                pool_kv[i] = [s + 1 if s > 1 else s for s in entry[1:]]

    configs = []
    heads = num_heads
    dim = patch_embed_dim
    for i in range(depth):
        heads = round_width(heads, head_mul[i], min_width=1, divisor=1)
        dim = round_width(dim, dim_mul[i], divisor=heads)
        dim_out = round_width(
            dim, dim_mul[i + 1], divisor=round_width(heads, head_mul[i + 1]))
        configs.append(dict(
            dim=dim, dim_out=dim_out, num_heads=heads, mlp_ratio=mlp_ratio,
            qkv_bias=qkv_bias, dropout_rate=dropout_rate_block,
            droppath_rate=float(dpr[i]),
            kernel_q=tuple(pool_q[i]), kernel_kv=tuple(pool_kv[i]),
            stride_q=tuple(stride_q[i]), stride_kv=tuple(stride_kv[i]),
            has_cls_embed=has_cls,
        ))
        # NB: the reference does NOT carry dim_out forward — the running dim is
        # re-derived from dim_mul[i] each iteration (video_transformer.py:755-761),
        # so dim_{i+1} = round_width(dim_i, dim_mul[i+1]) == dim_out_i.
    return tuple(configs), configs[-1]["dim_out"]


def create_multiscale_vision_transformers(
    spatial_size,
    temporal_size,
    cls_embed_on=True,
    depth=16,
    input_channels=3,
    patch_embed_dim=96,
    conv_patch_embed_stride=(2, 4, 4),
    num_heads=1,
    mlp_ratio=4.0,
    qkv_bias=True,
    dropout_rate_block=0.0,
    droppath_rate_block=0.0,
    embed_dim_mul=None,
    atten_head_mul=None,
    pool_q_stride_size=None,
    pool_kv_stride_size=None,
    pool_kv_stride_adaptive=None,
    pool_kvq_kernel=None,
    dtype=jnp.float32,
):
    """Build the MViT trunk the reference assembles at video_transformer.py:621-800.

    Patch embedding is applied by the caller (as in the reference MaskFeat);
    this returns the positional-encoding + blocks + final-norm module.
    """
    if isinstance(spatial_size, int):
        spatial_size = (spatial_size, spatial_size)
    input_dims = [temporal_size, spatial_size[0], spatial_size[1]]
    patch_embed_shape = tuple(
        input_dims[i] // conv_patch_embed_stride[i] for i in range(3))

    block_configs, embed_dim = build_mvit_block_configs(
        depth=depth, num_heads=num_heads, patch_embed_dim=patch_embed_dim,
        mlp_ratio=mlp_ratio, qkv_bias=qkv_bias,
        dropout_rate_block=dropout_rate_block,
        droppath_rate_block=droppath_rate_block,
        embed_dim_mul=embed_dim_mul, atten_head_mul=atten_head_mul,
        pool_q_stride_size=pool_q_stride_size,
        pool_kv_stride_size=pool_kv_stride_size,
        pool_kv_stride_adaptive=pool_kv_stride_adaptive,
        pool_kvq_kernel=pool_kvq_kernel, has_cls=cls_embed_on)

    return MultiscaleVisionTransformers(
        embed_dim=patch_embed_dim,
        patch_embed_shape=patch_embed_shape,
        block_configs=block_configs,
        cls_embed_on=cls_embed_on,
        dtype=dtype,
    ), embed_dim
