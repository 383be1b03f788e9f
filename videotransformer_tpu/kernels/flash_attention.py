"""Fused (flash) attention for TPU.

Entry point used by ``videotransformer_tpu.ops.blocks._sdpa_fused``. The Pallas
kernel is introduced for the sequence shapes the video models actually run
(temporal attention: N = num_frames (8/16); spatial/joint attention:
N = 197 … 1569). For tiny or oddly-shaped sequences the XLA path is already
MXU-bound and fusion-friendly, so we dispatch there.

The reference's hot kernel is a plain matmul+softmax Attention
(/root/reference/transformer.py:165-177); this module is its TPU-native,
memory-efficient replacement.
"""

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, scale):
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn * scale, axis=-1)
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", attn.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(v.dtype)


def flash_attention(q, k, v, scale: float):
    """q, k, v: (B, H, N, hd). Returns (B, H, N, hd).

    Dispatches to the Pallas fused kernel when the shape is profitable,
    otherwise the XLA einsum path (which XLA fuses well at small N).
    """
    B, H, N, hd = q.shape
    # Measured on v5e (see repo log): at N<=~200 XLA's fused batched attention
    # is at parity or faster than the Pallas kernel; the kernel wins on memory
    # (no N x N materialization) and time once N grows past ~1k (joint
    # space-time, MViT early blocks).
    if jax.default_backend() == "cpu" or N < 1024:
        return _xla_attention(q, k, v, scale)
    from videotransformer_tpu.kernels import flash_attention_pallas

    return flash_attention_pallas.flash_attention(q, k, v, scale=scale)
