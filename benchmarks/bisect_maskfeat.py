"""Bisect harness for the round-2 MaskFeat batch-8 TPU-worker fault.

RESOLVED (round 3). Bisection transcript, all on the real chip:
  step-xla 8 PASS / step-flash 8 PASS / step-ffn 8 CRASH
      -> the fused-FFN path, not flash attention
  kern-ffn 8 PASS (exact step shapes standalone), chain-ffn 8 PASS
      -> not the kernel in isolation, needs model context
  model-ffn 8 CRASH (model-only grad, no trainer/HOG/optimizer)
  model-ffn-d192 PASS / -d384 PASS / -d768 CRASH
      -> only the (D=768, hidden=3072) group
  mini768 CRASH (2x [XLA attn + fused FFN d768] + decoder, 60-line module)
  mini768-1blk PASS / mini768-noattn PASS
      -> needs >= 2 attention+FFN pairs in one program
  mini768-rows512 PASS at batch 8 AND 16 (grid lengths 25 and 50)
      -> the fault follows the 256-row backward block parametrization,
         not the grid length; HBM probe allocated 30 GiB fine (not OOM)
Resolution: fused_ffn_pallas.BWD_ROWS = 512 (see the comment there).
Standing regression checks: `step-full 8` here and the batch-8 sweep in
benchmarks/run_all.py; `mini768-rows256 8` reproduces the original fault.

Each mode runs standalone in its own process so a device fault cannot take
down a long-lived session; drive with
    timeout 1800 python benchmarks/bisect_maskfeat.py MODE [BATCH]

Kernel modes exercise the Pallas kernels in isolation at the exact shapes
the MaskFeat/MViT-B 16x224 pretrain step produces at the given batch (see
models/maskfeat.py defaults with pool_q_stride_size truncated to two
entries as benchmarks/run_all.py configures it):

  kern-flash : flash_attention fwd+bwd at every (B*H, Nq, Nkv, hd) of the step
  kern-ffn   : fused_prenorm_ffn fwd+bwd at every (M, D, hidden) of the step

Step modes run the real trainer._train_step with kernels selectively
disabled via monkeypatching (config.use_pallas_attention is all-or-nothing):

  step-xla   : no Pallas at all (attention backend "xla")
  step-flash : flash attention Pallas, FFN forced to the XLA path
  step-ffn   : fused FFN Pallas, attention forced to XLA einsum
  step-full  : everything Pallas

Model/minimal modes:

  model-ffn[-dD1[,D2]] : MaskFeat model-only grad, fused FFN kept only at
                         feature dims D1,D2 (no suffix: everywhere)
  mini768[-1blk][-noattn][-rowsR] : minimal reproducer around the D=768 FFN

Prints PASS/shape progress lines; a wedged/faulted worker shows up as the
surrounding `timeout` firing or an exception.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _flash_shapes(B):
    # (B*H, Nq, Nkv, hd) per MViT block group at batch B
    return [
        (B * 1, 25089, 393, 96),   # block 0
        (B * 2, 6273, 393, 96),    # blocks 1-2
        (B * 4, 1569, 393, 96),    # blocks 3-13
        (B * 8, 1569, 393, 96),    # blocks 14-15
    ]


def _ffn_shapes(B):
    # (M, D, hidden) for the fused (dim == dim_out) blocks at batch B
    return [
        (B * 6273, 192, 768),      # block 1
        (B * 1569, 384, 1536),     # blocks 3-12
        (B * 1569, 768, 3072),     # blocks 14-15
    ]


def kern_flash(B):
    from videotransformer_tpu.kernels.flash_attention_pallas import (
        flash_attention)

    for (BH, Nq, Nkv, hd) in _flash_shapes(B):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(BH, 1, Nq, hd), jnp.bfloat16)
        k = jnp.asarray(rng.randn(BH, 1, Nkv, hd), jnp.bfloat16)
        v = jnp.asarray(rng.randn(BH, 1, Nkv, hd), jnp.bfloat16)
        scale = hd ** -0.5

        def f(q, k, v):
            return flash_attention(q, k, v, scale).sum()

        print(f"flash fwd+bwd BH={BH} Nq={Nq} Nkv={Nkv} hd={hd} ...",
              flush=True)
        t0 = time.time()
        g = jax.jit(jax.grad(f, argnums=(0, 1, 2)))
        dq, dk, dv = g(q, k, v)
        jax.block_until_ready(dq)
        assert np.isfinite(np.float32(dq.astype(jnp.float32).sum())), "dq nan"
        print(f"  PASS ({time.time() - t0:.1f}s)", flush=True)
    print("kern-flash ALL PASS", flush=True)


def kern_ffn(B):
    from videotransformer_tpu.kernels.fused_ffn_pallas import (
        fused_prenorm_ffn)

    for (M, D, hidden) in _ffn_shapes(B):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(M, D), jnp.bfloat16)
        lns = jnp.ones((D,), jnp.bfloat16)
        lnb = jnp.zeros((D,), jnp.bfloat16)
        w1 = jnp.asarray(rng.randn(D, hidden) * 0.02, jnp.bfloat16)
        b1 = jnp.zeros((hidden,), jnp.bfloat16)
        w2 = jnp.asarray(rng.randn(hidden, D) * 0.02, jnp.bfloat16)
        b2 = jnp.zeros((D,), jnp.bfloat16)

        def f(*a):
            return fused_prenorm_ffn(*a, 1e-6).astype(jnp.float32).sum()

        print(f"ffn fwd+bwd M={M} D={D} hidden={hidden} ...", flush=True)
        t0 = time.time()
        g = jax.jit(jax.grad(f, argnums=tuple(range(7))))
        grads = g(x, lns, lnb, w1, b1, w2, b2)
        jax.block_until_ready(grads[0])
        assert np.isfinite(np.float32(grads[0].astype(jnp.float32).sum()))
        print(f"  PASS ({time.time() - t0:.1f}s)", flush=True)
    print("kern-ffn ALL PASS", flush=True)


def _disable_fused_ffn():
    """Force the XLA FFN path while leaving flash attention on."""
    import videotransformer_tpu.kernels.fused_ffn_pallas as ffn
    import videotransformer_tpu.models.mvit  # noqa: F401  (binds the import)

    def xla_ffn(x, lns, lnb, w1, b1, w2, b2, ln_eps=1e-5):
        shape = x.shape
        out = ffn._reference_jnp(
            x.reshape(-1, shape[-1]), lns, lnb, w1, b1, w2, b2, ln_eps)
        return out.reshape(shape[:-1] + (w2.shape[1],))

    ffn_mod = sys.modules["videotransformer_tpu.kernels.fused_ffn_pallas"]
    ffn_mod.fused_prenorm_ffn = xla_ffn


def _disable_flash():
    """Force the XLA attention einsum while leaving the fused FFN on."""
    import videotransformer_tpu.kernels.flash_attention_pallas as fa

    def xla_attn(q, k, v, scale):
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
        return jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    fa.flash_attention = xla_attn


def run_step(B, mode):
    from types import SimpleNamespace

    from videotransformer_tpu import config as vt_config
    from videotransformer_tpu.parallel.mesh import shard_batch
    from videotransformer_tpu.training.trainer import VideoTransformerTrainer

    if mode == "step-xla":
        vt_config.set_attention_backend("xla")
    elif mode == "step-flash":
        _disable_fused_ffn()
    elif mode == "step-ffn":
        _disable_flash()

    cfg = SimpleNamespace(
        objective="mim", arch="mvit", attention_type="divided_space_time",
        num_class=400, num_frames=16, img_size=224, batch_size=B,
        optim_type="adamw", lr=8e-4, lr_schedule="cosine", warmup_epochs=5,
        min_lr=1e-6, weight_decay=0.05, weight_decay_end=0.05, clip_grad=0.0,
        seed=0, mixup=False, eval_metrics="finetune", layer_decay=0.75,
        use_fp16=True)
    tr = VideoTransformerTrainer(cfg, ckpt_dir=None)
    rng = np.random.RandomState(0)
    batch = shard_batch(tr.mesh, {
        "video": rng.rand(B, 16, 3, 224, 224).astype(np.float32),
        "raw": (rng.rand(B, 16, 3, 224, 224) * 255).astype(np.float32),
        "mask": (rng.rand(B, 8, 14, 14) > 0.6).astype(np.int32),
        "cube_marker": np.tile(
            np.array([[[1, 2], [5, 1]] + [[0, 0]] * 6], np.int32), (B, 1, 1)),
        "cube_count": np.full((B,), 2, np.int32)})

    params = jax.tree.map(jnp.copy, tr.params)
    opt_state = jax.tree.map(jnp.copy, tr.opt_state)
    print(f"{mode} B={B}: compiling+running step 1 ...", flush=True)
    t0 = time.time()
    for s in range(3):
        key = jax.random.fold_in(tr.base_key, s)
        params, opt_state, st = tr._train_step(
            params, opt_state, batch, key, jnp.float32(8e-4),
            jnp.float32(0.05))
        loss = np.float32(jax.device_get(st["loss"]))
        print(f"  step {s}: loss={loss:.4f} ({time.time() - t0:.0f}s)",
              flush=True)
        assert np.isfinite(loss)
    print(f"{mode} B={B} PASS", flush=True)


def chain_ffn(B):
    """All 16 MViT-block FFNs chained in ONE jitted program (the in-step
    composition standalone kern-ffn lacks), fwd+bwd."""
    from videotransformer_tpu.kernels.fused_ffn_pallas import (
        fused_prenorm_ffn)

    # (n_tokens_per_clip, D, hidden, n_repeats) per fused block group
    groups = [(6273, 192, 768, 1), (1569, 384, 1536, 10), (1569, 768, 3072, 2)]
    rng = np.random.RandomState(0)
    params = []
    for (N, D, hidden, reps) in groups:
        for r in range(reps):
            params.append((
                jnp.ones((D,), jnp.bfloat16), jnp.zeros((D,), jnp.bfloat16),
                jnp.asarray(rng.randn(D, hidden) * 0.02, jnp.bfloat16),
                jnp.zeros((hidden,), jnp.bfloat16),
                jnp.asarray(rng.randn(hidden, D) * 0.02, jnp.bfloat16),
                jnp.zeros((D,), jnp.bfloat16)))
    x0 = jnp.asarray(rng.randn(B * 6273, 192), jnp.bfloat16)
    proj_a = jnp.asarray(rng.randn(192, 384) * 0.05, jnp.bfloat16)
    proj_b = jnp.asarray(rng.randn(384, 768) * 0.05, jnp.bfloat16)

    def f(x0, params, proj_a, proj_b):
        x = x0
        i = 0
        for (N, D, hidden, reps) in groups:
            for r in range(reps):
                x = x + fused_prenorm_ffn(x, *params[i], 1e-6)
                i += 1
            if D == 192:  # downsample tokens 4x, project 192->384
                x = x.reshape(-1, 4, D).mean(1)
                x = jnp.dot(x, proj_a, preferred_element_type=jnp.float32
                            ).astype(x.dtype)
            elif D == 384:
                x = jnp.dot(x, proj_b, preferred_element_type=jnp.float32
                            ).astype(x.dtype)
        return x.astype(jnp.float32).sum()

    print(f"chain-ffn B={B}: 13 fused FFNs in one program, fwd+bwd ...",
          flush=True)
    t0 = time.time()
    g = jax.jit(jax.grad(f, argnums=(0, 1)))
    gx, gp = g(x0, params, proj_a, proj_b)
    jax.block_until_ready(gx)
    assert np.isfinite(np.float32(gx.astype(jnp.float32).sum()))
    print(f"chain-ffn B={B} PASS ({time.time() - t0:.1f}s)", flush=True)


def _restrict_fused_ffn(only_d):
    """Keep the fused FFN Pallas kernel only where the feature dim D is in
    `only_d`; everything else takes the XLA path."""
    import videotransformer_tpu.kernels.fused_ffn_pallas as ffn

    real = ffn.fused_prenorm_ffn

    def selective(x, lns, lnb, w1, b1, w2, b2, ln_eps=1e-5):
        if x.shape[-1] in only_d:
            return real(x, lns, lnb, w1, b1, w2, b2, ln_eps)
        shape = x.shape
        out = ffn._reference_jnp(
            x.reshape(-1, shape[-1]), lns, lnb, w1, b1, w2, b2, ln_eps)
        return out.reshape(shape[:-1] + (w2.shape[1],))

    ffn.fused_prenorm_ffn = selective


def _hbm():
    try:
        st = jax.local_devices()[0].memory_stats()
        return (f"hbm {st.get('bytes_in_use', 0) / 2**30:.2f}"
                f"/{st.get('bytes_limit', 0) / 2**30:.2f} GiB")
    except Exception as e:
        return f"hbm ? ({type(e).__name__})"


def model_ffn(B, only_d=None, fwd_only=False):
    """MaskFeat model-only fwd+bwd at batch B: XLA attention + fused FFN,
    no trainer/optimizer/HOG — isolates the model composition."""
    _disable_flash()
    if only_d:
        _restrict_fused_ffn(only_d)
    from videotransformer_tpu.models.maskfeat import MaskFeat

    model = MaskFeat(pool_q_stride_size=((1, 1, 2, 2), (3, 1, 2, 2)),
                     feature_dim=216, num_frames=16, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(B, 16, 3, 224, 224), jnp.float32)
    target = jnp.asarray(rng.rand(B, 16, 14, 14, 108), jnp.float32)
    mask = jnp.asarray((rng.rand(B, 8, 14, 14) > 0.6), jnp.int32)
    marker = jnp.tile(jnp.asarray([[[1, 2], [5, 1]] + [[0, 0]] * 6],
                                  jnp.int32), (B, 1, 1))
    count = jnp.full((B,), 2, jnp.int32)
    params = jax.jit(lambda k, v: model.init(k, v, None, None, None, None))(
        jax.random.PRNGKey(0), video)["params"]

    def loss_fn(p):
        _, loss = model.apply({"params": p}, video, target, mask, marker,
                              count)
        return loss

    print(f"model-ffn B={B} only_d={only_d} fwd_only={fwd_only}: "
          f"MaskFeat (XLA attn + fused FFN) [{_hbm()}] ...", flush=True)
    t0 = time.time()
    if fwd_only:
        out = jax.jit(loss_fn)(params)
        jax.block_until_ready(out)
        assert np.isfinite(np.float32(out))
    else:
        grads = jax.jit(jax.grad(loss_fn))(params)
        jax.block_until_ready(grads)
        leaf = jax.tree.leaves(grads)[0]
        assert np.isfinite(np.float32(leaf.astype(jnp.float32).sum()))
    print(f"model-ffn B={B} PASS ({time.time() - t0:.1f}s) [{_hbm()}]",
          flush=True)


def mini768(B, blocks=2, attn=True):
    """Minimal stand-in for MViT blocks 13-15 + decoder around the D=768
    fused FFN: proj 384->768, [XLA attention + fused FFN] x2, LN + decoder +
    MSE — fwd+bwd at batch B. Faults => small repro; passes => the trigger
    needs more of the real model."""
    import flax.linen as nn

    from videotransformer_tpu.kernels.fused_ffn_pallas import (
        fused_prenorm_ffn)

    N, H = 1569, 8

    class Mini(nn.Module):
        @nn.compact
        def __call__(self, x, target):
            x = nn.Dense(768, dtype=jnp.bfloat16)(x)
            for i in range(blocks):
                if attn:
                    xn = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)(x)
                    qkv = nn.Dense(3 * 768, dtype=jnp.bfloat16)(xn)
                    qkv = qkv.reshape(x.shape[0], N, 3, H, 96)
                    qkv = qkv.transpose(2, 0, 3, 1, 4)
                    q, k, v = qkv[0], qkv[1], qkv[2]
                    a = jnp.einsum("bhnd,bhmd->bhnm", q * (96 ** -0.5), k,
                                   preferred_element_type=jnp.float32)
                    a = jax.nn.softmax(a, -1).astype(jnp.bfloat16)
                    o = jnp.einsum("bhnm,bhmd->bhnd", a, v,
                                   preferred_element_type=jnp.float32
                                   ).astype(jnp.bfloat16)
                    o = o.transpose(0, 2, 1, 3).reshape(x.shape[0], N, 768)
                    x = x + nn.Dense(768, dtype=jnp.bfloat16)(o)
                p_ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16,
                                    name=f"ffn_ln_{i}")
                fc1 = nn.Dense(3072, dtype=jnp.bfloat16, name=f"fc1_{i}")
                fc2 = nn.Dense(768, dtype=jnp.bfloat16, name=f"fc2_{i}")
                if self.is_initializing():
                    h = fc2(nn.gelu(fc1(p_ln(x)), approximate=False))
                else:
                    lp = p_ln.variables["params"]
                    p1 = fc1.variables["params"]
                    p2 = fc2.variables["params"]
                    h = fused_prenorm_ffn(
                        x, lp["scale"].astype(jnp.bfloat16),
                        lp["bias"].astype(jnp.bfloat16),
                        p1["kernel"].astype(jnp.bfloat16),
                        p1["bias"].astype(jnp.bfloat16),
                        p2["kernel"].astype(jnp.bfloat16),
                        p2["bias"].astype(jnp.bfloat16), 1e-6)
                x = x + h
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)(x)
            pred = nn.Dense(216, dtype=jnp.bfloat16)(x)
            return ((pred.astype(jnp.float32) - target) ** 2).mean()

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, 384) * 0.1, jnp.bfloat16)
    tgt = jnp.asarray(rng.randn(B, N, 216), jnp.float32)
    model = Mini()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, tgt)["params"]
    print(f"mini768 B={B} blocks={blocks} attn={attn}: fwd+bwd ...",
          flush=True)
    t0 = time.time()
    g = jax.jit(jax.grad(lambda p: model.apply({"params": p}, x, tgt)))(params)
    jax.block_until_ready(g)
    assert np.isfinite(np.float32(jax.tree.leaves(g)[0].astype(
        jnp.float32).sum()))
    print(f"mini768 B={B} PASS ({time.time() - t0:.1f}s)", flush=True)


def main():
    mode = sys.argv[1]
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    if mode == "kern-flash":
        kern_flash(B)
    elif mode == "kern-ffn":
        kern_ffn(B)
    elif mode == "chain-ffn":
        chain_ffn(B)
    elif mode == "model-ffn":
        model_ffn(B)
    elif mode.startswith("model-ffn-d"):
        dims = tuple(int(d) for d in mode[len("model-ffn-d"):].split(","))
        model_ffn(B, only_d=dims)
    elif mode == "model-ffn-fwd":
        model_ffn(B, fwd_only=True)
    elif mode.startswith("model-ffn-fwdd"):
        dims = tuple(int(d) for d in mode[len("model-ffn-fwdd"):].split(","))
        model_ffn(B, only_d=dims, fwd_only=True)
    elif mode.startswith("mini768"):
        opts = mode[len("mini768"):].strip("-").split("-") if len(mode) > 7 else []
        import videotransformer_tpu.kernels.fused_ffn_pallas as ffn_mod
        for o in opts:
            if o.startswith("rows"):
                ffn_mod.BWD_ROWS = int(o[4:])
            if o.startswith("frows"):
                ffn_mod.FWD_ROWS = int(o[5:])
        mini768(B, blocks=1 if "1blk" in opts else 2,
                attn="noattn" not in opts)
    elif mode.startswith("step-"):
        run_step(B, mode)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
