"""Global runtime configuration for videotransformer_tpu.

Small, explicit switches instead of environment sniffing. The main one is the
attention backend: "xla" (plain jnp einsum/softmax, always available, supports
returning attention weights) or "pallas" (fused Pallas TPU flash-attention
kernels, used automatically on TPU when attention weights are not requested).
"""

import jax

_ATTENTION_BACKEND = "auto"  # "auto" | "xla" | "pallas"


def set_attention_backend(backend: str) -> None:
    global _ATTENTION_BACKEND
    assert backend in ("auto", "xla", "pallas"), backend
    _ATTENTION_BACKEND = backend


def get_attention_backend() -> str:
    return _ATTENTION_BACKEND


def use_pallas_attention() -> bool:
    """Resolve the backend: pallas only on real TPU backends (not CPU/interpret)."""
    if _ATTENTION_BACKEND == "pallas":
        return True
    if _ATTENTION_BACKEND == "xla":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
