"""Break the supervised train step into timed pieces to find the bottleneck.

Times, per batch of 8 TimeSformer-B 8x224 clips (bf16):
  fwd            : model forward + head + loss
  fwd+bwd        : value_and_grad of the same
  augment        : device-side crop/resize/flip/normalize
  mixup          : batched mixup
  opt            : optimizer update on precomputed grads
  full step      : the trainer's real _train_step
"""

import os
import sys
import time
from types import SimpleNamespace

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(out):
    # np.asarray (device->host read): block_until_ready alone does not wait
    # for completion through the axon relay backend
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]


def timeit(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps * 1000


def main():
    from videotransformer_tpu.models import TimeSformer
    from videotransformer_tpu.ops.blocks import ClassificationHead
    from videotransformer_tpu.training.trainer import (
        VideoTransformerTrainer, soft_target_cross_entropy)
    from videotransformer_tpu.data.mixup import Mixup
    from videotransformer_tpu.data.device_augment import augment_batch
    from videotransformer_tpu.parallel.mesh import shard_batch

    B = 8
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(B, 8, 3, 224, 224), jnp.float32)
    labels = jnp.asarray(np.arange(B) % 400, jnp.int32)
    raw = jnp.asarray((rng.rand(B, 8, 256, 342, 3) * 255), jnp.uint8)

    model = TimeSformer(num_frames=8, img_size=224,
                        attention_type="divided_space_time",
                        dtype=jnp.bfloat16)
    head = ClassificationHead(400, 768, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), video[:1])["params"]
    hp = jax.jit(head.init)(jax.random.PRNGKey(1), jnp.zeros((1, 768)))["params"]

    mixup = Mixup(num_classes=400)
    key = jax.random.PRNGKey(0)
    soft = jax.nn.one_hot(labels, 400)

    def loss_fn(p, hp, v, y, k):
        feats = model.apply({"params": p}, v, deterministic=False,
                            rngs={"dropout": k})
        logits = head.apply({"params": hp}, feats)
        return soft_target_cross_entropy(logits, y)

    fwd = jax.jit(loss_fn)
    fwd_det = jax.jit(lambda p, hp, v, y: soft_target_cross_entropy(
        head.apply({"params": hp}, model.apply({"params": p}, v)), y))
    bwd = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
    aug = jax.jit(lambda k, r: augment_batch(
        k, r, out_size=224, mean=(0.45,) * 3, std=(0.225,) * 3))
    mix = jax.jit(lambda k, v, y: mixup(k, v, y))

    print(f"fwd (train, dropout rngs): {timeit(fwd, params, hp, video, soft, key):8.1f} ms")
    print(f"fwd (eval)               : {timeit(fwd_det, params, hp, video, soft):8.1f} ms")
    print(f"fwd+bwd                  : {timeit(bwd, params, hp, video, soft, key):8.1f} ms")
    print(f"augment                  : {timeit(aug, key, raw):8.1f} ms")
    print(f"mixup                    : {timeit(mix, key, video, labels):8.1f} ms")

    cfg = SimpleNamespace(
        objective="supervised", arch="timesformer",
        attention_type="divided_space_time", num_class=400, num_frames=8,
        img_size=224, batch_size=8, optim_type="adamw", lr=5e-3,
        lr_schedule="cosine", warmup_epochs=5, min_lr=1e-6, weight_decay=0.05,
        weight_decay_end=0.05, clip_grad=1.0, seed=0, mixup=True,
        eval_metrics="finetune", layer_decay=1.0, use_fp16=True,
        device_augment=True, data_statics="kinetics")
    tr = VideoTransformerTrainer(cfg, ckpt_dir=None)
    batch = shard_batch(tr.mesh, {
        "raw_video": np.asarray(raw), "label": np.asarray(labels)})

    def step(s):
        k = jax.random.fold_in(tr.base_key, s)
        return tr._train_step(tr.params, tr.opt_state, batch, k,
                              jnp.float32(5e-3), jnp.float32(0.05))

    for s in range(2):
        tr.params, tr.opt_state, st = step(s)
        _sync(st["loss"])
    t0 = time.perf_counter()
    for s in range(2, 7):
        tr.params, tr.opt_state, st = step(s)
    _sync(st["loss"])
    print(f"full train step          : {(time.perf_counter() - t0) / 5 * 1000:8.1f} ms")


if __name__ == "__main__":
    main()
