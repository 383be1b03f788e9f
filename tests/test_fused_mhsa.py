"""Fused prenorm-MHSA Pallas kernel vs its pure-jnp reference (interpret mode
on CPU), plus the module-level dispatch gate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # heavy compiles / CLI+serving integration


def _args(B=3, N=65, D=64, seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(B, N, D) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(D) * 0.1 + 1, jnp.float32),
        jnp.asarray(rng.randn(D) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(D, 3 * D) * 0.05, jnp.float32),
        jnp.asarray(rng.randn(3 * D) * 0.05, jnp.float32),
        jnp.asarray(rng.randn(D, D) * 0.05, jnp.float32),
        jnp.asarray(rng.randn(D) * 0.05, jnp.float32),
    )


@pytest.mark.parametrize("add_residual", [True, False])
def test_fused_kernel_matches_reference(add_residual):
    from jax.experimental.pallas import tpu as pltpu

    from videotransformer_tpu.kernels.fused_mhsa_pallas import (
        _reference_jnp, fused_prenorm_mhsa)

    args = _args()
    H, scale = 4, (64 // 4) ** -0.5
    ref = _reference_jnp(*args, num_heads=H, scale=scale, ln_eps=1e-5,
                         add_residual=add_residual)
    with pltpu.force_tpu_interpret_mode():
        out = fused_prenorm_mhsa(*args, H, scale, 1e-5, add_residual)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_gradients_match_reference():
    from jax.experimental.pallas import tpu as pltpu

    from videotransformer_tpu.kernels.fused_mhsa_pallas import (
        _reference_jnp, fused_prenorm_mhsa)

    args = _args(B=2, N=64)
    H, scale = 4, (64 // 4) ** -0.5

    def loss_ref(*a):
        return (_reference_jnp(*a, num_heads=H, scale=scale, ln_eps=1e-5) ** 2).sum()

    def loss_fused(*a):
        return (fused_prenorm_mhsa(*a, H, scale, 1e-5, True) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("add_residual", [True, False])
def test_fused_gradients_match_reference_recompute_qkv(add_residual):
    """The flash-style RECOMPUTE_QKV memory knob (backward rebuilds qkv from
    x in VMEM instead of loading the saved residual) must produce the same
    gradients as the saved-qkv default."""
    from jax.experimental.pallas import tpu as pltpu

    from videotransformer_tpu.kernels import fused_mhsa_pallas as fm

    args = _args(B=2, N=64)
    H, scale = 4, (64 // 4) ** -0.5

    def loss_ref(*a):
        return (fm._reference_jnp(*a, num_heads=H, scale=scale, ln_eps=1e-5,
                                  add_residual=add_residual) ** 2).sum()

    def loss_fused(*a):
        return (fm.fused_prenorm_mhsa(*a, H, scale, 1e-5,
                                      add_residual) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    assert fm.RECOMPUTE_QKV is False  # throughput default (module docstring)
    try:
        fm.RECOMPUTE_QKV = True
        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    finally:
        fm.RECOMPUTE_QKV = False
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_dispatch_gate():
    """CPU / short-N / return_attention must stay on the module path."""
    from videotransformer_tpu.ops.blocks import JointAttention

    mod = JointAttention(32, 4)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 100, 32), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    # on CPU this runs the unfused path (use_pallas_attention() False)
    out = mod.apply({"params": params}, x)
    assert out.shape == x.shape
    attn = mod.apply({"params": params}, x, return_attention=True)
    assert attn.shape == (2, 4, 100, 100)


@pytest.mark.parametrize("shape", [(2, 65, 64), (3, 100, 64)])
def test_fused_ffn_matches_reference(shape):
    from jax.experimental.pallas import tpu as pltpu

    from videotransformer_tpu.kernels.fused_ffn_pallas import (
        _reference_jnp, fused_prenorm_ffn)

    rng = np.random.RandomState(1)
    B, N, D = shape
    x = jnp.asarray(rng.randn(B, N, D) * 0.1, jnp.float32)
    lns = jnp.asarray(rng.randn(D) * 0.1 + 1, jnp.float32)
    lnb = jnp.asarray(rng.randn(D) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.randn(D, 4 * D) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.randn(4 * D) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.randn(4 * D, D) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(D) * 0.05, jnp.float32)

    ref = _reference_jnp(x.reshape(-1, D), lns, lnb, w1, b1, w2, b2, 1e-5)
    with pltpu.force_tpu_interpret_mode():
        out = fused_prenorm_ffn(x, lns, lnb, w1, b1, w2, b2)
        # gradients too
        g = jax.grad(lambda *a: (fused_prenorm_ffn(*a) ** 2).sum(),
                     argnums=(0, 3, 5))(x, lns, lnb, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out).reshape(-1, D), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    g_ref = jax.grad(
        lambda xx, ww1, ww2: (_reference_jnp(
            xx.reshape(-1, D), lns, lnb, ww1, b1, ww2, b2, 1e-5) ** 2).sum(),
        argnums=(0, 1, 2))(x, w1, w2)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)



@pytest.mark.parametrize("N,block", [(64, 8), (72, 9), (256, 8), (252, 9)])
def test_block_diag_matches_per_sequence(N, block):
    """Packed block-diagonal attention == independent per-sequence attention
    (the divided-temporal packing), forward and gradients. The (256, 8) and
    (252, 9) cases take the chunked score-tile path (_score_chunk > 0)."""
    from jax.experimental.pallas import tpu as pltpu

    from videotransformer_tpu.kernels.fused_mhsa_pallas import (
        _reference_jnp, fused_prenorm_mhsa)

    D, H = 64, 4
    rng = np.random.RandomState(7)
    args = _args(B=2, N=N, D=D, seed=7)
    scale = (D // H) ** -0.5

    # reference: run each length-`block` sequence separately through the
    # unmasked reference, then re-pack
    x = args[0]
    xs = x.reshape(2 * (N // block), block, D)
    ref = _reference_jnp(xs, *args[1:], num_heads=H, scale=scale,
                         ln_eps=1e-5, add_residual=False)
    ref = ref.reshape(2, N, D)

    with pltpu.force_tpu_interpret_mode():
        out = fused_prenorm_mhsa(*args, H, scale, 1e-5, False, block)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)

    def loss_packed(*a):
        return (fused_prenorm_mhsa(*a, H, scale, 1e-5, False, block) ** 2).sum()

    def loss_ref(*a):
        xs_ = a[0].reshape(2 * (N // block), block, D)
        return (_reference_jnp(xs_, *a[1:], num_heads=H, scale=scale,
                               ln_eps=1e-5, add_residual=False) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss_packed, argnums=tuple(range(7)))(*args)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_pack_group():
    from videotransformer_tpu.ops.blocks import _pack_group

    assert _pack_group(1568, 8) == 56   # 56*8=448 <= 512; 1568 = 2^5*7^2
    assert _pack_group(1568, 9) == 56   # 504 <= 512
    assert _pack_group(7, 8) == 7
    assert _pack_group(13, 100) == 1    # nothing fits -> no packing
    # the divided-temporal call site packs to 1024 rows (chunked scores)
    assert _pack_group(1568, 8, max_rows=1024) == 112  # N=896 = 7*128
    assert _pack_group(1568, 9, max_rows=1024) == 112  # N=1008 = 7*144


def test_score_chunk():
    from videotransformer_tpu.kernels.fused_mhsa_pallas import _score_chunk

    assert _score_chunk(896, 8) == 128   # the batch-8 TimeSformer pack
    assert _score_chunk(1008, 9) == 144  # the cls-token temporal layout
    assert _score_chunk(448, 8) == 112
    assert _score_chunk(64, 8) == 0      # chunk must be < N
    assert _score_chunk(72, 9) == 0      # largest divisor < N is 36 < 64
    assert _score_chunk(256, 8) == 128
