"""Flash-attention Pallas kernel (forward + backward) vs XLA einsum reference,
in interpret mode on CPU. Covers Nq == Nkv (TimeSformer/ViViT) and Nq != Nkv
(MViT pooled K/V), plus non-block-aligned Nq (padded-row masking in backward).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _ref(q, k, v, scale):
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _args(B, H, Nq, Nkv, hd, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, Nq, hd) * 0.2, jnp.float32)
    k = jnp.asarray(rng.randn(B, H, Nkv, hd) * 0.2, jnp.float32)
    v = jnp.asarray(rng.randn(B, H, Nkv, hd) * 0.2, jnp.float32)
    return q, k, v


@pytest.mark.parametrize("Nq,Nkv", [(64, 64), (197, 197), (200, 50), (130, 260)])
def test_forward_matches_reference(Nq, Nkv):
    from jax.experimental.pallas import tpu as pltpu

    from videotransformer_tpu.kernels.flash_attention_pallas import (
        flash_attention)

    q, k, v = _args(2, 3, Nq, Nkv, 32)
    scale = 32**-0.5
    ref = _ref(q, k, v, scale)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("Nq,Nkv", [(64, 64), (197, 197), (200, 50)])
def test_backward_matches_reference(Nq, Nkv):
    from jax.experimental.pallas import tpu as pltpu

    from videotransformer_tpu.kernels.flash_attention_pallas import (
        flash_attention)

    q, k, v = _args(2, 2, Nq, Nkv, 32, seed=1)
    scale = 32**-0.5

    def loss_ref(q, k, v):
        return (_ref(q, k, v, scale) ** 2).sum()

    def loss_fused(q, k, v):
        return (flash_attention(q, k, v, scale) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5, err_msg=f"d{name}")


def test_backward_multi_qblock_accumulation():
    """Nq large enough for >1 query block: dk/dv accumulate across blocks."""
    from jax.experimental.pallas import tpu as pltpu

    from videotransformer_tpu.kernels.flash_attention_pallas import _flash_bwd

    q, k, v = _args(1, 2, 700, 100, 32, seed=2)  # BQ=512 -> 2 q blocks
    scale = 32**-0.5
    do = jnp.asarray(
        np.random.RandomState(3).randn(1, 2, 700, 32) * 0.2, jnp.float32)

    _, vjp = jax.vjp(lambda q, k, v: _ref(q, k, v, scale), q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(do)
    with pltpu.force_tpu_interpret_mode():
        dq, dk, dv = _flash_bwd(q, k, v, do, scale)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               rtol=5e-4, atol=5e-5)
