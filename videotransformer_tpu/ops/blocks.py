"""Transformer building blocks, TPU-native.

Functional/flax.linen re-design of the reference op library (reference
transformer.py — see SURVEY.md §2.1 #7). Behavioral parity targets, with
citations into /root/reference:

- ``Attention``: fused-QKV multi-head self-attention (transformer.py:153-177).
- ``DividedTemporalAttention`` / ``DividedSpatialAttention``: prenorm divided
  space-time attention with the exact cls-token plumbing and reshape order of
  transformer.py:179-382 (patch-major ``b (p t) d`` token layout; zero-initialized
  ``temporal_fc`` when the cls token is absent, transformer.py:228-232; cls token
  averaged over the folded axis when present, transformer.py:270-277 / 370-377).
- ``JointAttention``: prenorm joint space-time MHSA (transformer.py:385-456).
- ``FFN``: prenorm MLP with exact-erf GELU (transformer.py:459-523; torch
  nn.GELU is the erf form, so ``approximate=False`` here).
- ``BasicTransformerBlock`` / ``TransformerContainer``: operator assembly with the
  ``use_cls_token = (i == len(order) - 2)`` rule (transformer.py:602-612) and
  DropPath rates linspace(0, drop_path_rate) across depth (transformer.py:543).
- ``PatchEmbed``: Conv2d per-frame or Conv3d tubelet embedding
  (transformer.py:83-151) as lax convs in NHWC/NDHWC layout for the MXU.
- ``ClassificationHead`` (transformer.py:45-80), ``get_sine_cosine_pos_emb``
  (transformer.py:12-22), ``drop_path`` (transformer.py:25-42).

LayerNorm eps is 1e-5 (torch default) inside blocks; models use 1e-6 for the
final norm (video_transformer.py:119).

All reshapes between the flat token sequence ``b (p t) d`` and the divided
attention layouts are pure reshape/transpose — XLA fuses them into the
surrounding matmuls; there is no data movement cost on TPU for the reshape-only
(temporal) direction.
"""

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from videotransformer_tpu import config as vt_config
from videotransformer_tpu.parallel import sp as vt_sp
from videotransformer_tpu.ops import initializers as init

Dtype = Any


def get_sine_cosine_pos_emb(n_position: int, d_hid: int) -> jnp.ndarray:
    """Sinusoid position encoding table, (1, n_position, d_hid).

    Matches reference transformer.py:12-22 (numpy double precision, then cast).
    """
    position = np.arange(n_position)[:, None]
    hid = np.arange(d_hid)[None, :]
    angle = position / np.power(10000, 2 * (hid // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return jnp.asarray(table[None], dtype=jnp.float32)


def drop_path(
    x: jnp.ndarray, rate, deterministic: bool, rng: Optional[jax.Array]
) -> jnp.ndarray:
    """Stochastic depth per leading-batch row (reference transformer.py:34-42).

    ``rate`` may be a python float (the usual case) or a traced scalar — the
    pipeline-parallel trainer scans one stacked block over layers, so the
    per-layer linspace rate arrives as data (parallel/pp.py)."""
    is_static = isinstance(rate, (int, float))
    if deterministic or (is_static and rate == 0.0):
        return x
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    if is_static:
        keep_prob = 1.0 - rate
        mask = jnp.floor(keep_prob + jax.random.uniform(rng, shape, dtype=x.dtype))
        return x / keep_prob * mask
    keep_prob = (1.0 - rate).astype(jnp.float32)
    mask = jnp.floor(keep_prob + jax.random.uniform(rng, shape, dtype=jnp.float32))
    return x * (mask / keep_prob).astype(x.dtype)


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True, rate=None):
        """``rate`` overrides the module constant (traced scalars allowed) —
        used by the pipeline-parallel block scan where the stochastic-depth
        rate varies per layer of one shared module."""
        if rate is None and (self.rate == 0.0 or deterministic):
            return x
        if deterministic:
            return x
        return drop_path(x, self.rate if rate is None else rate,
                         deterministic, self.make_rng("dropout"))


def _sdpa(q, k, v, scale, dtype):
    """Scaled dot-product attention core; q,k,v: (B, H, N, hd).

    fp32 softmax accumulation regardless of compute dtype (bf16-safe on MXU).
    """
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    attn = attn * scale
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", attn.astype(dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(dtype), attn


def _sdpa_fused(q, k, v, scale, dtype):
    """Fused attention without materialized weights (Pallas flash on TPU)."""
    if q.shape[2] <= 16 and jax.default_backend() != "cpu":
        return _sdpa_small_n(q, k, v, scale, dtype)
    if vt_config.use_pallas_attention():
        from videotransformer_tpu.kernels import flash_attention

        return flash_attention.flash_attention(q, k, v, scale=scale)
    out, _ = _sdpa(q, k, v, scale, dtype)
    return out


def _sdpa_small_n(q, k, v, scale, dtype):
    """Tiny-sequence attention (divided TEMPORAL attention: N = 8/16 frames)
    as VPU broadcast-multiply-reduce instead of batched matmuls.

    The matmul formulation dispatches ~B*P*H tiny (N x N x hd) MXU ops, each
    padded to full 128x128 tiles — measured ~2x slower end-to-end than letting
    the VPU fuse the broadcast contraction (fwd 48.8 -> 44.7 ms for
    TimeSformer-B 8x224 batch 8 on v5e)."""
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    s = (qf[..., :, None, :] * kf[..., None, :, :]).sum(-1) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = (p[..., None] * vf[..., None, :, :]).sum(-2)
    return o.astype(dtype)


class Attention(nn.Module):
    """Fused-QKV MHSA, parity with reference transformer.py:153-177."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, need_weights: bool = False):
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim**-0.5

        qkv = nn.Dense(
            self.dim * 3,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            kernel_init=init.torch_linear_kernel_init(),
            bias_init=init.torch_linear_bias_init(self.dim),
            name="qkv",
        )(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4)  # (3, B, H, N, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]

        if need_weights or self.attn_drop > 0.0:
            out, attn = _sdpa(q, k, v, scale, self.dtype)
            attn_d = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
            if self.attn_drop > 0.0:
                out = jnp.einsum(
                    "bhnm,bhmd->bhnd",
                    attn_d.astype(self.dtype),
                    v,
                    preferred_element_type=jnp.float32,
                ).astype(self.dtype)
        else:
            out = _sdpa_fused(q, k, v, scale, self.dtype)
            attn = None

        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = nn.Dense(
            self.dim,
            dtype=self.dtype,
            kernel_init=init.torch_linear_kernel_init(),
            bias_init=init.torch_linear_bias_init(self.dim),
            name="proj",
        )(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out, attn


def _pack_group(n_seqs: int, seq_len: int, max_rows: int = 512) -> int:
    """Largest divisor G of n_seqs with G*seq_len <= max_rows: how many tiny
    sequences to pack into one block-diagonal fused-attention call."""
    best = 1
    g = 1
    while g * g <= n_seqs:
        if n_seqs % g == 0:
            for d in (g, n_seqs // g):
                if d * seq_len <= max_rows and d > best:
                    best = d
        g += 1
    return best


def _use_fused_mhsa(mod, x, return_attention) -> bool:
    """Fused prenorm-MHSA kernel eligibility: TPU backend, no attention-weight
    request, no attention dropout, sequence long enough that the per-head
    matmuls tile the MXU (the tiny temporal N stays on the VPU path)."""
    return (
        not return_attention
        and not mod.is_initializing()
        and mod.attn_drop == 0.0
        # lower bound: short sequences stay on the VPU path; upper bound: the
        # kernel keeps the full (N, N) score matrix per head in VMEM
        # (fp32 N^2 + activations must fit the raised 100MB VMEM budget);
        # longer sequences take the q-blocked flash kernel instead
        and 64 <= x.shape[1] <= 2048
        and vt_config.use_pallas_attention()
    )


class DividedTemporalAttention(nn.Module):
    """Temporal half of divided space-time attention.

    Parity with reference transformer.py:179-282: strip the cls token, fold
    patches into batch (``b (p t) d -> (b p) t d`` — a pure reshape under the
    patch-major layout), prenorm + MHSA over the t axis, optional zero-init
    ``temporal_fc``, residual, then re-attach the cls token.
    """

    embed_dims: int
    num_heads: int
    num_frames: int
    use_cls_token: bool
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.attn = Attention(
            self.embed_dims, self.num_heads, qkv_bias=True,
            attn_drop=self.attn_drop, dtype=self.dtype)
        self.post_drop = nn.Dropout(self.proj_drop)
        self.layer_drop = DropPath(self.drop_path_rate)
        if not self.use_cls_token:
            self.temporal_fc = nn.Dense(
                self.embed_dims, dtype=self.dtype,
                kernel_init=init.zeros_init, bias_init=init.zeros_init)

    def __call__(self, query, deterministic: bool = True, return_attention: bool = False,
                 dpr=None):
        cls_token = query[:, :1, :]  # (b, 1, d)
        query = query[:, 1:, :]
        residual = query if not self.use_cls_token else None
        full_residual = jnp.concatenate([cls_token, query], axis=1)

        b, n, d = query.shape
        t = self.num_frames
        p = n // t

        # b (p t) d -> (b p) t d : pure reshape (patch-major token layout)
        x = query.reshape(b * p, t, d)
        if self.use_cls_token:
            cls_rep = jnp.broadcast_to(cls_token[:, None, :, :], (b, p, 1, d))
            cls_rep = cls_rep.reshape(b * p, 1, d)
            x = jnp.concatenate([cls_rep, x], axis=1)
        # sequence parallel: each device owns complete length-t temporal rows
        # (b over data, p over seq) — see parallel/sp.py
        x = vt_sp.constrain_rows(x)

        # TPU: pack G consecutive length-t sequences into one fused
        # prenorm-MHSA call with a block-diagonal mask — the t x t attentions
        # become full MXU tiles (a round-1 per-head VPU kernel LOST to XLA at
        # 269 -> 190 clips/s; the packed-masked formulation is the one that
        # wins). Handles both plain length-t and cls-token (t+1)-length
        # sequence layouts; falls back to the module path on CPU /
        # attention-weight requests / attention dropout.
        # max_rows=1024: with chunked score tiles (fused_mhsa_pallas.
        # _score_chunk) the (N, N) score matrix never materializes, so
        # bigger packs are pure win — fewer grid programs and larger qkv
        # matmuls. At S=1568 seqs of t=8 this packs N=896 rows per program
        # with exact 128-row score chunks.
        S, t_len, d_ = x.shape
        G = _pack_group(S, t_len, max_rows=1024)
        if (not return_attention and not self.is_initializing()
                and self.attn_drop == 0.0 and G > 1
                and vt_config.use_pallas_attention()):
            from videotransformer_tpu.kernels.fused_mhsa_pallas import (
                fused_prenorm_mhsa)

            np_ = self.norm.variables["params"]
            ap = self.attn.variables["params"]
            head_dim = self.embed_dims // self.num_heads
            num_heads, dtype = self.num_heads, self.dtype

            def _packed_mhsa(rows, lns, lnb, wqkv, bqkv, wproj, bproj):
                # row-polymorphic: under sequence parallelism this runs per
                # device shard (jax.shard_map), so the pack group is derived
                # from the LOCAL row count; under tensor parallelism the
                # local head count is derived from the weight SHARD's width
                s_l = rows.shape[0]
                g_l = _pack_group(s_l, t_len, max_rows=1024)
                h_l = wqkv.shape[1] // (3 * head_dim)
                packed = rows.reshape(s_l // g_l, g_l * t_len, d_)
                out = fused_prenorm_mhsa(
                    packed, lns, lnb, wqkv, bqkv, wproj, bproj,
                    h_l, head_dim**-0.5, 1e-5, False, t_len)
                return out.reshape(s_l, t_len, d_)

            attn_out = vt_sp.fused_sharded_call(
                _packed_mhsa, x.astype(dtype),
                np_["scale"].astype(dtype), np_["bias"].astype(dtype),
                ap["qkv"]["kernel"].astype(dtype),
                ap["qkv"]["bias"].astype(dtype),
                ap["proj"]["kernel"].astype(dtype),
                ap["proj"]["bias"].astype(dtype),
                qkv_head_dim=head_dim)
        else:
            xn = self.norm(x)
            attn_out, attn_w = self.attn(
                xn, deterministic=deterministic, need_weights=return_attention)
            if return_attention:
                return attn_w
        attn_out = self.post_drop(attn_out, deterministic=deterministic)
        attn_out = self.layer_drop(attn_out, deterministic=deterministic, rate=dpr)
        if not self.use_cls_token:
            attn_out = self.temporal_fc(attn_out)

        if self.use_cls_token:
            new_cls = attn_out[:, 0, :].reshape(b, p, d).mean(axis=1, keepdims=True)
            patches = attn_out[:, 1:, :].reshape(b, p * t, d)
            out = jnp.concatenate([new_cls, patches], axis=1)
            return full_residual + out
        else:
            patches = attn_out.reshape(b, p * t, d)
            new_query = residual + patches
            return jnp.concatenate([cls_token, new_query], axis=1)


class DividedSpatialAttention(nn.Module):
    """Spatial half of divided space-time attention (transformer.py:285-382).

    Same as the temporal half but folding frames into batch:
    ``b (p t) d -> (b t) p d`` (reshape + transpose), no temporal_fc, and the
    cls token — when present — is averaged over frames on the way back.

    On TPU (no dropout, no attention-weight request) the prenorm + QKV +
    attention + out-projection runs as ONE fused Pallas kernel
    (kernels/fused_mhsa_pallas.py); init and CPU use the module path.
    """

    embed_dims: int
    num_heads: int
    num_frames: int
    use_cls_token: bool
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.attn = Attention(
            self.embed_dims, self.num_heads, qkv_bias=True,
            attn_drop=self.attn_drop, dtype=self.dtype)
        self.post_drop = nn.Dropout(self.proj_drop)
        self.layer_drop = DropPath(self.drop_path_rate)

    def _prenorm_mhsa(self, x, deterministic, return_attention):
        if _use_fused_mhsa(self, x, return_attention):
            from videotransformer_tpu.kernels.fused_mhsa_pallas import (
                fused_prenorm_mhsa)

            np_ = self.norm.variables["params"]
            ap = self.attn.variables["params"]
            head_dim = self.embed_dims // self.num_heads
            num_heads, dtype = self.num_heads, self.dtype

            def _mhsa(rows, lns, lnb, wqkv, bqkv, wproj, bproj):
                # row-polymorphic over the leading (b·t) axis so it can run
                # per device shard under sequence parallelism (shard_map);
                # head count derived from the (possibly model-sharded) weight
                return fused_prenorm_mhsa(
                    rows, lns, lnb, wqkv, bqkv, wproj, bproj,
                    wqkv.shape[1] // (3 * head_dim), head_dim**-0.5,
                    1e-5, False)

            return vt_sp.fused_sharded_call(
                _mhsa, x.astype(dtype),
                np_["scale"].astype(dtype), np_["bias"].astype(dtype),
                ap["qkv"]["kernel"].astype(dtype),
                ap["qkv"]["bias"].astype(dtype),
                ap["proj"]["kernel"].astype(dtype),
                ap["proj"]["bias"].astype(dtype),
                qkv_head_dim=head_dim), None
        xn = self.norm(x)
        return self.attn(xn, deterministic=deterministic,
                         need_weights=return_attention)

    def __call__(self, query, deterministic: bool = True, return_attention: bool = False,
                 dpr=None):
        cls_token = query[:, :1, :]
        query = query[:, 1:, :]
        residual = query if not self.use_cls_token else None
        full_residual = jnp.concatenate([cls_token, query], axis=1)

        b, n, d = query.shape
        t = self.num_frames
        p = n // t

        # b (p t) d -> (b t) p d
        x = query.reshape(b, p, t, d).transpose(0, 2, 1, 3).reshape(b * t, p, d)
        if self.use_cls_token:
            cls_rep = jnp.broadcast_to(cls_token[:, None, :, :], (b, t, 1, d))
            cls_rep = cls_rep.reshape(b * t, 1, d)
            x = jnp.concatenate([cls_rep, x], axis=1)
        # sequence parallel: each device owns complete length-p spatial rows
        # (b over data, t over seq); the patches->frames transition from the
        # temporal layout becomes one all-to-all over the seq axis
        x = vt_sp.constrain_rows(x)

        attn_out, attn_w = self._prenorm_mhsa(x, deterministic, return_attention)
        if return_attention:
            return attn_w

        attn_out = self.post_drop(attn_out, deterministic=deterministic)
        attn_out = self.layer_drop(attn_out, deterministic=deterministic, rate=dpr)

        if self.use_cls_token:
            new_cls = attn_out[:, 0, :].reshape(b, t, d).mean(axis=1, keepdims=True)
            patches = attn_out[:, 1:, :]
            # (b t) p d -> b (p t) d
            patches = (
                patches.reshape(b, t, p, d).transpose(0, 2, 1, 3).reshape(b, p * t, d)
            )
            out = jnp.concatenate([new_cls, patches], axis=1)
            return full_residual + out
        else:
            patches = (
                attn_out.reshape(b, t, p, d).transpose(0, 2, 1, 3).reshape(b, p * t, d)
            )
            new_query = residual + patches
            return jnp.concatenate([cls_token, new_query], axis=1)


class JointAttention(nn.Module):
    """Prenorm joint MHSA with residual (reference MultiheadAttentionWithPreNorm,
    transformer.py:385-456). Uses the fused Pallas prenorm-MHSA kernel on TPU."""

    embed_dims: int
    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.attn = Attention(
            self.embed_dims, self.num_heads, qkv_bias=True,
            attn_drop=self.attn_drop, dtype=self.dtype)
        self.post_drop = nn.Dropout(self.proj_drop)
        self.layer_drop = DropPath(self.drop_path_rate)

    def __call__(self, query, deterministic: bool = True, return_attention: bool = False,
                 dpr=None):
        residual = query
        if (vt_sp.active() and not return_attention and self.attn_drop == 0.0
                and not self.is_initializing() and vt_sp.ring_eligible(query)):
            # sequence parallel over GLOBAL attention: tokens stay sharded
            # over the seq axis and the K/V blocks ride the ring
            # (parallel/sp.py ring_prenorm_mhsa) — no all-gather, O(n/sp)
            # activation memory per chip
            np_ = self.norm.variables["params"]
            ap = self.attn.variables["params"]
            head_dim = self.embed_dims // self.num_heads
            attn_out = vt_sp.ring_prenorm_mhsa(
                query.astype(self.dtype),
                np_["scale"].astype(self.dtype), np_["bias"].astype(self.dtype),
                ap["qkv"]["kernel"].astype(self.dtype),
                ap["qkv"]["bias"].astype(self.dtype),
                ap["proj"]["kernel"].astype(self.dtype),
                ap["proj"]["bias"].astype(self.dtype),
                self.num_heads, head_dim**-0.5, 1e-5)
        elif _use_fused_mhsa(self, query, return_attention):
            from videotransformer_tpu.kernels.fused_mhsa_pallas import (
                fused_prenorm_mhsa)

            np_ = self.norm.variables["params"]
            ap = self.attn.variables["params"]
            head_dim = self.embed_dims // self.num_heads

            def _joint_mhsa(rows, lns, lnb, wqkv, bqkv, wproj, bproj):
                return fused_prenorm_mhsa(
                    rows, lns, lnb, wqkv, bqkv, wproj, bproj,
                    wqkv.shape[1] // (3 * head_dim), head_dim**-0.5,
                    1e-5, False)

            attn_out = vt_sp.fused_sharded_call(
                _joint_mhsa, query.astype(self.dtype),
                np_["scale"].astype(self.dtype), np_["bias"].astype(self.dtype),
                ap["qkv"]["kernel"].astype(self.dtype),
                ap["qkv"]["bias"].astype(self.dtype),
                ap["proj"]["kernel"].astype(self.dtype),
                ap["proj"]["bias"].astype(self.dtype),
                qkv_head_dim=head_dim)
        else:
            x = self.norm(query)
            attn_out, attn_w = self.attn(
                x, deterministic=deterministic, need_weights=return_attention)
            if return_attention:
                return attn_w
        attn_out = self.post_drop(attn_out, deterministic=deterministic)
        attn_out = self.layer_drop(attn_out, deterministic=deterministic, rate=dpr)
        return residual + attn_out


class FFN(nn.Module):
    """Prenorm MLP with residual (reference FFNWithPreNorm, transformer.py:459-523).

    On TPU the 2-layer case runs as one fused Pallas kernel (LN + fc1 + GELU +
    fc2; the 4D hidden never touches HBM) — kernels/fused_ffn_pallas.py.
    """

    embed_dims: int
    hidden_channels: int
    num_layers: int = 2
    dropout_p: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        layers = []
        in_ch = self.embed_dims
        for i in range(self.num_layers - 1):
            layers.append(nn.Dense(
                self.hidden_channels, dtype=self.dtype,
                kernel_init=init.torch_linear_kernel_init(),
                bias_init=init.torch_linear_bias_init(in_ch),
                name=f"layers_{i}"))
            in_ch = self.hidden_channels
        layers.append(nn.Dense(
            self.embed_dims, dtype=self.dtype,
            kernel_init=init.torch_linear_kernel_init(),
            bias_init=init.torch_linear_bias_init(self.hidden_channels),
            name=f"layers_{self.num_layers - 1}"))
        self.layers = layers
        self.drop = nn.Dropout(self.dropout_p)
        self.layer_drop = DropPath(self.drop_path_rate)

    def __call__(self, x, deterministic: bool = True, dpr=None):
        residual = x
        use_fused = (
            self.num_layers == 2
            and self.dropout_p == 0.0
            and not self.is_initializing()
            and vt_config.use_pallas_attention()
        )
        if use_fused:
            from videotransformer_tpu.kernels.fused_ffn_pallas import (
                _reference_jnp, fused_prenorm_ffn)

            np_ = self.norm.variables["params"]
            p1 = self.layers[0].variables["params"]
            p2 = self.layers[1].variables["params"]

            def _jnp_row_ffn(xx, *w):
                # the peeled cls row under sequence parallelism: one token of
                # a per-token op through the kernel's jnp twin
                b_, n_, d_ = xx.shape
                return _reference_jnp(
                    xx.reshape(b_ * n_, d_), *w, 1e-5).reshape(b_, n_, d_)

            # fused_sharded_call: per-shard kernel under sequence parallelism
            # (rows independent) and/or tensor parallelism (hidden neurons
            # column/row-sharded over 'model'); plain call otherwise
            x = vt_sp.fused_sharded_call(
                fused_prenorm_ffn,
                x.astype(self.dtype),
                np_["scale"].astype(self.dtype), np_["bias"].astype(self.dtype),
                p1["kernel"].astype(self.dtype), p1["bias"].astype(self.dtype),
                p2["kernel"].astype(self.dtype), p2["bias"].astype(self.dtype),
                token_major=True, head_fn=_jnp_row_ffn)
        else:
            x = vt_sp.constrain_tokens(x)
            x = self.norm(x)
            for i, layer in enumerate(self.layers):
                x = layer(x)
                if i < self.num_layers - 1:
                    # torch nn.GELU default = exact erf gelu
                    x = nn.gelu(x, approximate=False)
                    x = self.drop(x, deterministic=deterministic)
            x = self.drop(x, deterministic=deterministic)
        x = self.layer_drop(x, deterministic=deterministic, rate=dpr)
        return residual + x


class BasicTransformerBlock(nn.Module):
    """One block assembled from ``operator_order`` (transformer.py:568-636).

    ``use_cls_token = (i == len(operator_order) - 2)``: only the attention just
    before the FFN touches the cls token (transformer.py:602-612).
    """

    embed_dims: int
    num_heads: int
    num_frames: int
    hidden_channels: int
    operator_order: Sequence[str]
    dpr: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, return_attention: bool = False,
                 dpr=None):
        # ``dpr`` (traced scalar) overrides the static ``self.dpr`` in every
        # operator's DropPath — the pipeline-parallel trainer scans ONE block
        # module over stacked per-layer params, so the stochastic-depth
        # linspace must arrive as data rather than a module constant
        attentions = []
        ffns = []
        order = tuple(self.operator_order)
        attn_idx = 0
        ffn_idx = 0
        for i, operator in enumerate(order):
            if operator == "self_attn":
                attentions.append(
                    JointAttention(
                        self.embed_dims,
                        self.num_heads,
                        drop_path_rate=self.dpr,
                        dtype=self.dtype,
                        name=f"attentions_{attn_idx}",
                    )
                )
                attn_idx += 1
            elif operator == "time_attn":
                attentions.append(
                    DividedTemporalAttention(
                        self.embed_dims,
                        self.num_heads,
                        self.num_frames,
                        use_cls_token=(i == len(order) - 2),
                        drop_path_rate=self.dpr,
                        dtype=self.dtype,
                        name=f"attentions_{attn_idx}",
                    )
                )
                attn_idx += 1
            elif operator == "space_attn":
                attentions.append(
                    DividedSpatialAttention(
                        self.embed_dims,
                        self.num_heads,
                        self.num_frames,
                        use_cls_token=(i == len(order) - 2),
                        drop_path_rate=self.dpr,
                        dtype=self.dtype,
                        name=f"attentions_{attn_idx}",
                    )
                )
                attn_idx += 1
            elif operator == "ffn":
                ffns.append(
                    FFN(
                        self.embed_dims,
                        self.hidden_channels,
                        drop_path_rate=self.dpr,
                        dtype=self.dtype,
                        name=f"ffns_{ffn_idx}",
                    )
                )
                ffn_idx += 1
            else:
                raise TypeError(f"Unsupported operator type {operator}")

        for i, layer in enumerate(attentions):
            if i >= len(attentions) - 1 and return_attention:
                return layer(x, deterministic=deterministic, return_attention=True)
            x = layer(x, deterministic=deterministic, dpr=dpr)
        for layer in ffns:
            x = layer(x, deterministic=deterministic, dpr=dpr)
        return x


class TransformerContainer(nn.Module):
    """Stack of BasicTransformerBlocks with DropPath linspace 0 -> drop_path_rate
    (transformer.py:526-565).

    ``remat=True`` wraps each block in jax.checkpoint (activation
    rematerialization): activations are recomputed in the backward pass,
    trading ~30% step time for O(depth) less activation memory — the standard
    lever for scaling batch/frames on HBM-limited chips."""

    num_transformer_layers: int
    embed_dims: int
    num_heads: int
    num_frames: int
    hidden_channels: int
    operator_order: Sequence[str]
    drop_path_rate: float = 0.1
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, return_attention: bool = False):
        dpr = np.linspace(0, self.drop_path_rate, self.num_transformer_layers)
        block_cls = BasicTransformerBlock
        use_remat = self.remat and not return_attention
        if use_remat:
            # arg 0 is the module itself under nn.remat; deterministic (arg 2)
            # must be static and passed positionally
            block_cls = nn.remat(BasicTransformerBlock, static_argnums=(2,))
        for i in range(self.num_transformer_layers):
            last = i == self.num_transformer_layers - 1
            block = block_cls(
                embed_dims=self.embed_dims,
                num_heads=self.num_heads,
                num_frames=self.num_frames,
                hidden_channels=self.hidden_channels,
                operator_order=self.operator_order,
                dpr=float(dpr[i]),
                dtype=self.dtype,
                name=f"layers_{i}",
            )
            if last and return_attention:
                return block(x, deterministic=deterministic, return_attention=True)
            if use_remat:
                x = block(x, deterministic)
            else:
                x = block(x, deterministic=deterministic)
        return x


class _PatchProjection(nn.Module):
    """Patch/tubelet projection as an explicit matmul with a conv-layout
    kernel (checkpoint-compatible with Conv2d/Conv3d weights).

    kernel == stride means the conv IS a reshaped matmul; expressing it as
    one makes the BACKWARD a plain matmul too — XLA's conv-general gradient
    path measured ~4x the forward cost for this shape on TPU.
    """

    kernel_spatial: Sequence[int]  # (kh, kw) or (kt, kh, kw)
    in_channels: int
    embed_dims: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, patches_2d):
        k_shape = tuple(self.kernel_spatial) + (self.in_channels, self.embed_dims)
        kernel = self.param(
            "kernel", init.kaiming_normal_fan_in_relu(), k_shape, jnp.float32)
        bias = self.param("bias", init.zeros_init, (self.embed_dims,), jnp.float32)
        flat = kernel.reshape(-1, self.embed_dims).astype(self.dtype)
        out = jnp.dot(patches_2d.astype(self.dtype), flat,
                      preferred_element_type=jnp.float32)
        return (out + bias.astype(jnp.float32)).astype(self.dtype)


class PatchEmbed(nn.Module):
    """Image/tubelet to patch embedding (transformer.py:83-151).

    Input: (b, t, c, h, w) — the reference's public layout. kernel == stride
    means the conv is exactly a reshaped matmul, so it runs as one explicit
    MXU matmul (forward AND backward — see _PatchProjection).

    Conv2d: per-frame 16x16 patches -> (b*t, h'*w', embed_dims)
    Conv3d: tubelet (tube, 16, 16)  -> (b*t', h'*w', embed_dims)
    """

    img_size: int
    patch_size: int
    tube_size: int = 2
    in_channels: int = 3
    embed_dims: int = 768
    conv_type: str = "Conv2d"
    dtype: Dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @nn.compact
    def __call__(self, x):
        b, t, c, h, w = x.shape
        ps = self.patch_size
        gh, gw = h // ps, w // ps
        if self.conv_type == "Conv2d":
            # (b t, gh, ps, gw, ps, c) -> patches (b t, gh gw, ps*ps*c)
            x = x.reshape(b * t, c, gh, ps, gw, ps)
            x = x.transpose(0, 2, 4, 3, 5, 1).reshape(b * t, gh * gw, ps * ps * c)
            out = _PatchProjection(
                (ps, ps), c, self.embed_dims, dtype=self.dtype,
                name="projection")(x)
            return out
        elif self.conv_type == "Conv3d":
            tt = self.tube_size
            gt = t // tt
            # (b, gt, tt, c, gh, ps, gw, ps) -> (b gt, gh gw, tt*ps*ps*c)
            x = x.reshape(b, gt, tt, c, gh, ps, gw, ps)
            x = x.transpose(0, 1, 4, 6, 2, 5, 7, 3).reshape(
                b * gt, gh * gw, tt * ps * ps * c)
            out = _PatchProjection(
                (tt, ps, ps), c, self.embed_dims, dtype=self.dtype,
                name="projection")(x)
            return out
        else:
            raise TypeError(f"Unsupported conv layer type {self.conv_type}")


class ClassificationHead(nn.Module):
    """Linear classifier head (transformer.py:45-80)."""

    num_classes: int
    in_channels: int
    init_std: float = 0.02
    eval_metrics: str = "finetune"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.eval_metrics == "finetune":
            kernel_init = init.trunc_normal_init(std=self.init_std)
        else:  # linear_prob: N(0, 0.01)
            kernel_init = init.normal_init(std=0.01)

        # torch Linear weight is (out, in); trunc_normal on it is equivalent to
        # trunc_normal on the flax (in, out) kernel (elementwise iid).
        return nn.Dense(
            self.num_classes,
            dtype=self.dtype,
            kernel_init=kernel_init,
            bias_init=init.zeros_init,
            name="cls_head",
        )(x)
