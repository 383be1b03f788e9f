"""Train/val/test harness over a device mesh — replaces the reference's
PyTorch-Lightning ``VideoTransformer`` module (model_trainer.py:39-310).

Behavior parity (citations into /root/reference/model_trainer.py):
- model build per arch/objective (:52-79): timesformer/vivit supervised,
  mvit supervised (frozen decoder), mim -> MaskFeat with
  pool_q_stride_size=[[1,1,2,2],[3,1,2,2]], feature_dim=216.
- losses: CrossEntropy, SoftTargetCrossEntropy under mixup (:87-91);
  linear_prob trains only the cls head on frozen features (:114-116, 198-201).
- per-EPOCH cosine LR with warmup (mim/supervised variants) or multistep
  (:120-133); cosine weight-decay ramp on the decay group each step (:147-153).
- per-parameter grad clipping with logged total norm (:155-170).
- metrics: top1/top5 train/val/test; test averages logits over 3 crops
  (:291-299); best-val and last/periodic checkpoints (:233-252, 282-289).
- step logging: time, data_time, top1, top5, lr, grad_norm (:172-179, 218-224).

TPU-native design: one jitted ``train_step`` over the mesh — batch sharded on
the ``data`` axis, params replicated, gradient psum over ICI inserted by XLA.
Mixup and (for mim) HOG target extraction run inside the step so they fuse
into the input pipeline. Dropout/droppath use explicit PRNG keys folded per
step. Checkpoints go through orbax (last / best / periodic + resume).
"""

import os
import os.path as osp
import time
from functools import partial
from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp

from videotransformer_tpu.data.mixup import Mixup
from videotransformer_tpu.parallel.mesh import create_mesh, replicate
from videotransformer_tpu.training import schedules
from videotransformer_tpu.training.metrics import AccuracyMeter, topk_correct
from videotransformer_tpu.training.optimizer import build_optimizer
from videotransformer_tpu.ops.blocks import ClassificationHead


def cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1).mean()


def soft_target_cross_entropy(logits, soft_targets):
    """timm SoftTargetCrossEntropy (model_trainer.py:89)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return (-soft_targets * logp).sum(axis=-1).mean()


def model_dtype(configs):
    """'-use_fp16 True' -> bf16 compute with fp32 params on TPU
    (SURVEY §2.2: the TPU equivalent of the reference's AMP fp16)."""
    return jnp.bfloat16 if getattr(configs, "use_fp16", False) else jnp.float32


def build_model(configs):
    """model_trainer.py:52-79."""
    from videotransformer_tpu.models import TimeSformer, ViViT

    dtype = model_dtype(configs)
    if configs.objective == "mim" or configs.arch == "mvit":
        from videotransformer_tpu.models.maskfeat import MaskFeat

        return MaskFeat(
            num_frames=configs.num_frames,
            img_size=configs.img_size,
            pool_q_stride_size=((1, 1, 2, 2), (3, 1, 2, 2)),
            feature_dim=2 * 2 * 2 * 3 * 9,
            dtype=dtype,
        )
    # drop_path_rate is hardcoded in the reference (transformer.py:543 uses
    # 0.1); exposed as an optional config attr so tests/experiments can turn
    # stochastic depth off (e.g. pipeline-parallel parity checks)
    dpr = {}
    if getattr(configs, "drop_path_rate", None) is not None:
        dpr["drop_path_rate"] = configs.drop_path_rate
    if configs.arch == "vivit":
        return ViViT(
            img_size=configs.img_size,
            num_frames=configs.num_frames,
            attention_type=configs.attention_type,
            remat=getattr(configs, "remat", False),
            dtype=dtype,
            **dpr,
        )
    if configs.arch == "timesformer":
        return TimeSformer(
            img_size=configs.img_size,
            num_frames=configs.num_frames,
            attention_type=configs.attention_type,
            remat=getattr(configs, "remat", False),
            dtype=dtype,
            **dpr,
        )
    raise ValueError(configs.arch)


class VideoTransformerTrainer:
    def __init__(self, configs, ckpt_dir=None, do_eval=False, do_test=False,
                 n_crops=3, mesh=None, seed=None, log_dir=None):
        self.configs = configs
        self.ckpt_dir = ckpt_dir
        # the reference leaves its run log in results/{tag}/ as a regression
        # artifact (demo/log_arch_timesformer…txt, model_trainer.py:172-179);
        # tee every rank-zero print into results/{tag}/log/train.log
        self._log_fh = None
        if log_dir and jax.process_index() == 0:
            os.makedirs(log_dir, exist_ok=True)
            self._log_fh = open(os.path.join(log_dir, "train.log"), "a")
        self.do_eval = do_eval
        self.do_test = do_test
        self.n_crops = n_crops
        if mesh is None:
            mesh = create_mesh(seq=getattr(configs, "sp", 1),
                               model=getattr(configs, "tp", 1))
        self.mesh = mesh
        # sequence parallelism (parallel/sp.py): activation-sharding state for
        # the divided-attention blocks, keyed off the mesh's seq axis. The
        # state is module-global (flax modules are pure), so the most recently
        # constructed trainer owns it — a seq=1 trainer explicitly clears it
        from videotransformer_tpu.parallel import sp as _sp
        from videotransformer_tpu.parallel import tp as _tp

        if dict(self.mesh.shape).get("seq", 1) > 1:
            _sp.enable_sequence_parallel(self.mesh)
        else:
            _sp.disable_sequence_parallel()
        # tensor parallelism: the fused Pallas kernels must run per
        # model-shard (sp.fused_sharded_call); same module-global pattern
        if dict(self.mesh.shape).get("model", 1) > 1:
            _tp.enable_tensor_parallel(self.mesh)
        else:
            _tp.disable_tensor_parallel()
        self.objective = configs.objective
        self.supervised = configs.objective == "supervised"
        self.linear_prob = (
            self.supervised and getattr(configs, "eval_metrics", "finetune") == "linear_prob")
        self.is_mvit = getattr(configs, "arch", None) == "mvit"

        seed = configs.seed if seed is None else seed
        self.base_key = jax.random.PRNGKey(seed)

        self.model = build_model(configs)
        dummy = jnp.zeros(
            (1, configs.num_frames, 3, configs.img_size, configs.img_size), jnp.float32)
        with self.mesh:
            if self.objective == "mim":
                t_mask = configs.num_frames // 2
                # mask grid = patch grid / pooling downsample (14 for 224^2)
                grid = configs.img_size // (
                    self.model.conv_patch_embed_stride[1]
                    * self.model.downsample_rate)
                dummy_mask = jnp.zeros((1, t_mask, grid, grid), jnp.int32)
                dummy_marker = jnp.zeros((1, 8, 2), jnp.int32)
                dummy_count = jnp.zeros((1,), jnp.int32)
                model_params = jax.jit(
                    partial(self.model.init, target_x=None))(
                        self.base_key, dummy, mask=dummy_mask,
                        cube_marker=dummy_marker, cube_count=dummy_count)["params"]
            else:
                model_params = jax.jit(self.model.init)(self.base_key, dummy)["params"]

        params: Dict[str, Any] = {"model": model_params}
        if self.supervised:
            self.cls_head = ClassificationHead(
                configs.num_class, self.model.embed_dims,
                eval_metrics=getattr(configs, "eval_metrics", "finetune"),
                dtype=model_dtype(configs))
            head_key = jax.random.fold_in(self.base_key, 1)
            params["cls_head"] = jax.jit(self.cls_head.init)(
                head_key, jnp.zeros((1, self.model.embed_dims)))["params"]
            if getattr(configs, "mixup", False):
                self.mixup_fn = Mixup(num_classes=configs.num_class)
            else:
                self.mixup_fn = None
        else:
            self.cls_head = None
            self.mixup_fn = None

        # pretrained weight import (video_transformer.py:146-165 equivalent)
        pretrain_pth = getattr(configs, "pretrain_pth", None)
        if pretrain_pth:
            from videotransformer_tpu.models import convert

            weights_from = getattr(configs, "weights_from", "imagenet")
            att = getattr(configs, "attention_type", "divided_space_time")
            conv_type = "Conv3d" if configs.arch == "vivit" else "Conv2d"
            if os.path.isdir(pretrain_pth):
                # one of our own orbax checkpoints (a directory, vs the
                # torch .pth files below): params-only, non-strict — this is
                # how a MaskFeat mim run's last_checkpoint seeds an mvit
                # supervised finetune (reference model_trainer.py:72-77)
                params["model"] = convert.init_from_orbax_pretrain(
                    params["model"], pretrain_pth)
            elif self.is_mvit or self.objective == "mim":
                # MaskFeat/MViT builds route through the MaskFeat key surgery
                # regardless of weights_from (reference model_trainer.py:72-77
                # -> video_transformer.py:866-870 init_weights always calls
                # init_from_kinetics_pretrain_)
                params["model"] = convert.init_maskfeat_from_kinetics_pretrain(
                    params["model"], pretrain_pth)
            elif weights_from == "imagenet":
                params["model"] = convert.init_from_vit_pretrain(
                    params["model"], pretrain_pth, conv_type, att, "repeat")
            elif weights_from == "kinetics":
                params["model"] = convert.init_from_kinetics_pretrain(
                    params["model"], pretrain_pth, att)
            else:
                raise TypeError(f"not support the pretrained weight {pretrain_pth}")

        # linear_prob: only the head is optimized (model_trainer.py:114-116)
        if self.linear_prob:
            opt_tree = {"cls_head": params["cls_head"]}
        elif self.is_mvit and self.supervised:
            # frozen decoder_pred (model_trainer.py:78-79): exclude from opt tree
            opt_tree = {k: v for k, v in params.items()}
            model_wo_dec = {k: v for k, v in params["model"].items() if k != "decoder_pred"}
            opt_tree["model"] = model_wo_dec
        else:
            opt_tree = params

        self.params = self._place_params(params)
        self.optimizer = self._make_optimizer(opt_tree)
        with self.mesh:
            # zeros_like preserves each param's sharding, so the optimizer
            # state lands with the same layout as the params
            self.opt_state = self.optimizer.init(self._opt_subtree(self.params))

        self.max_top1_acc = 0.0
        self.epoch = 0
        self.global_step = 0
        self.train_meter = AccuracyMeter()
        self.val_meter = AccuracyMeter()
        self.test_meter = AccuracyMeter()

        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    # ------------------------------------------------------------------
    def _place_params(self, params):
        """Host param tree -> runtime placement. Base: replicated for pure
        DP; Megatron-style column/row sharding over the 'model' axis when the
        mesh carries one (tensor parallel — TPU-native extension,
        parallel/tp.py). The pipeline trainer overrides this to stack and
        pipe-shard the transformer blocks."""
        if dict(self.mesh.shape).get("model", 1) > 1:
            from videotransformer_tpu.parallel.tp import shard_params_tp

            return shard_params_tp(self.mesh, params)
        return replicate(self.mesh, params)

    def _make_optimizer(self, opt_tree):
        """``opt_tree`` is the HOST (canonical, unstacked) optimizer subtree;
        subclasses whose runtime param layout differs override this so the
        optimizer masks match the runtime tree structure. The fused flat
        small-leaf AdamW group (optimizer.py flat_small — collapses MViT's
        ~150 tiny per-tensor update fusions) requires replicated params, so
        it is on exactly when the mesh has no model axis."""
        fused = dict(self.mesh.shape).get("model", 1) == 1 \
            and bool(getattr(self.configs, "fused_adamw", True))
        return build_optimizer(self.configs, opt_tree,
                               is_pretrain=not self.supervised,
                               fused_flat=fused)

    def _canonical_params(self):
        """Runtime params -> the canonical checkpoint tree (identity here;
        the pipeline trainer unstacks its per-layer stacking)."""
        return self.params

    def _canonical_opt_moments(self):
        """Runtime moments -> the canonical (tree-shaped) checkpoint layout;
        identity unless the optimizer stores its small-leaf group flat."""
        return (self.opt_state.step,
                self.optimizer.canonical_moments(self.opt_state.mu),
                self.optimizer.canonical_moments(self.opt_state.nu))

    def _place_opt_moment(self, tree):
        """Canonical checkpoint moment tree -> runtime placement."""
        return self.optimizer.runtime_moments(replicate(self.mesh, tree))

    # ------------------------------------------------------------------
    def _opt_subtree(self, params):
        if self.linear_prob:
            return {"cls_head": params["cls_head"]}
        if self.is_mvit and self.supervised:
            return {
                "cls_head": params.get("cls_head"),
                "model": {k: v for k, v in params["model"].items() if k != "decoder_pred"},
            }
        return params

    def _merge_opt_subtree(self, params, new_sub):
        out = dict(params)
        if self.linear_prob:
            out["cls_head"] = new_sub["cls_head"]
            return out
        if self.is_mvit and self.supervised:
            model = dict(params["model"])
            model.update(new_sub["model"])
            out["model"] = model
            if new_sub.get("cls_head") is not None:
                out["cls_head"] = new_sub["cls_head"]
            return out
        return new_sub

    # ------------------------------------------------------------------
    def _forward_features(self, model_params, video, deterministic, rngs=None):
        if self.is_mvit:
            feats = self.model.apply(
                {"params": model_params}, video, method="forward_features",
                deterministic=deterministic, rngs=rngs)
            return feats[:, 0]
        return self.model.apply(
            {"params": model_params}, video, deterministic=deterministic, rngs=rngs)

    def _build_train_step(self):
        cfg = self.configs
        use_mixup = self.mixup_fn is not None

        def step(params, opt_state, batch, key, lr, wd):
            drop_key, mix_key = jax.random.split(key)

            if self.objective == "mim":
                if "raw_video" in batch:
                    # fully-device mim hot path: ONE uint8 canonical clip in;
                    # the mim geometric recipe (RRC scale (0.5,1.0) + flip,
                    # no jitter — reference data_trainer.py:61-66) runs on
                    # device and yields BOTH the normalized model input and
                    # the un-normalized pixels the HOG targets read
                    from videotransformer_tpu.data.device_augment import (
                        augment_batch)
                    from videotransformer_tpu.training.data_module import (
                        dataset_statistics)

                    aug_key, _ = jax.random.split(mix_key)
                    mean, std = dataset_statistics(
                        getattr(cfg, "data_statics", "kinetics"))
                    mim_video, mim_raw = augment_batch(
                        aug_key, batch["raw_video"], out_size=cfg.img_size,
                        scale=(0.5, 1.0), hflip=0.5, color=(0, 0, 0, 0),
                        auto_augment=False, mean=mean, std=std,
                        with_raw=True)
                else:
                    mim_video = batch["video"]
                    mim_raw = batch.get("raw")  # host-augmented float path

                def loss_fn(opt_sub):
                    full = self._merge_opt_subtree(params, opt_sub)
                    if "hog" in batch:
                        target = batch["hog"]
                    else:
                        # device-side HOG targets from the un-normalized clip,
                        # computed only at cube-center frames and scattered
                        # back (reference computes exactly these on host,
                        # dataset.py:190-196)
                        from videotransformer_tpu.data.hog import batched_hog_targets

                        frames = mim_raw.transpose(0, 1, 3, 4, 2)  # (B,T,H,W,C)
                        B, T = frames.shape[0], frames.shape[1]
                        markers = batch["cube_marker"]
                        centers = markers[..., 0] * 2 + markers[..., 1]  # (B, M)
                        m_idx = jnp.arange(markers.shape[1])[None, :]
                        valid = (m_idx < batch["cube_count"][:, None]).astype(jnp.float32)
                        gathered = jnp.take_along_axis(
                            frames, centers[..., None, None, None], axis=1)
                        hog_m = batched_hog_targets(gathered)  # (B, M, 14, 14, 108)
                        onehot = jax.nn.one_hot(centers, T) * valid[..., None]
                        target = jnp.einsum("bmt,bmhwc->bthwc", onehot, hog_m)
                    preds, loss = self.model.apply(
                        {"params": full["model"]},
                        mim_video, target, batch["mask"],
                        batch["cube_marker"], batch["cube_count"],
                        deterministic=False, rngs={"dropout": drop_key})
                    return loss, {}
            else:
                if "raw_video" in batch:
                    # TPU hot path: augmentation fused into the step
                    from videotransformer_tpu.data.device_augment import augment_batch
                    from videotransformer_tpu.training.data_module import (
                        dataset_statistics)

                    aug_key, mix_key = jax.random.split(mix_key)
                    mean, std = dataset_statistics(
                        getattr(cfg, "data_statics", "kinetics"))
                    video = augment_batch(
                        aug_key, batch["raw_video"], out_size=cfg.img_size,
                        scale=tuple(getattr(cfg, "aug_scale", (0.08, 1.0))),
                        hflip=getattr(cfg, "aug_hflip", 0.5),
                        color=tuple(getattr(cfg, "aug_color",
                                            (0.4, 0.4, 0.4, 0.0))),
                        auto_augment=bool(getattr(cfg, "auto_augment", None)),
                        mean=mean, std=std)
                    labels = batch["label"]
                else:
                    video, labels = batch["video"], batch["label"]
                if use_mixup:
                    mixed_video, soft_labels = self.mixup_fn(mix_key, video, labels)
                else:
                    mixed_video, soft_labels = video, None

                def loss_fn(opt_sub):
                    full = self._merge_opt_subtree(params, opt_sub)
                    if self.linear_prob:
                        feats = self._forward_features(
                            full["model"], mixed_video, deterministic=True)
                        feats = jax.lax.stop_gradient(feats)
                    else:
                        feats = self._forward_features(
                            full["model"], mixed_video, deterministic=False,
                            rngs={"dropout": drop_key})
                    logits = self.cls_head.apply({"params": full["cls_head"]}, feats)
                    if use_mixup:
                        loss = soft_target_cross_entropy(logits, soft_labels)
                        acc_labels = soft_labels.argmax(-1)
                    else:
                        loss = cross_entropy(logits, labels)
                        acc_labels = labels
                    correct = topk_correct(logits, acc_labels)
                    return loss, {"correct": correct, "bs": logits.shape[0]}

            opt_sub = self._opt_subtree(params)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(opt_sub)
            new_sub, new_opt_state, grad_norm = self.optimizer.update(
                grads, opt_state, opt_sub, lr, wd)
            new_params = self._merge_opt_subtree(params, new_sub)
            stats = {"loss": loss, "grad_norm": grad_norm}
            if aux:
                stats.update(
                    top1=aux["correct"][1], top5=aux["correct"][5], bs=aux["bs"])
            return new_params, new_opt_state, stats

        return jax.jit(step, donate_argnums=(0, 1))

    def _build_eval_step(self):
        if not self.supervised:
            return None

        def step(params, batch, n_crops):
            if "raw_video" in batch:
                # device-side eval recipe (Resize + Center/ThreeCrop +
                # Normalize fused into the step) on canonical uint8 clips
                from videotransformer_tpu.data.device_augment import (
                    eval_preprocess_batch)
                from videotransformer_tpu.training.data_module import (
                    dataset_statistics)

                cfg = self.configs
                mean, std = dataset_statistics(
                    getattr(cfg, "data_statics", "kinetics"))
                video = eval_preprocess_batch(
                    batch["raw_video"], img_size=cfg.img_size,
                    three_crop=n_crops > 1, mean=mean, std=std)
            else:
                video = batch["video"]
            feats = self._forward_features(
                params["model"], video, deterministic=True)
            logits = self.cls_head.apply({"params": params["cls_head"]}, feats)
            if n_crops > 1:
                logits = logits.reshape(-1, n_crops, logits.shape[-1]).mean(axis=1)
            # labels == -1 mark mesh-divisibility padding rows: they never
            # match a top-k index, and they don't count toward the total
            correct = topk_correct(logits, batch["label"])
            valid = (batch["label"] >= 0).sum()
            return {"top1": correct[1], "top5": correct[5], "bs": valid}

        return jax.jit(step, static_argnums=(2,))

    def _pad_eval_batch(self, batch, n_crops=1):
        """Pad an eval batch so the leading dim divides the mesh; padded rows
        carry label -1 (ignored by the metric)."""
        n_dev = self.mesh.devices.size
        labels = batch["label"]
        b = labels.shape[0]
        pad = (-b) % n_dev
        if pad == 0 and (labels.shape[0] * n_crops) % n_dev == 0:
            return batch
        labels = np.concatenate([labels, np.full((pad,), -1, labels.dtype)])
        if "raw_video" in batch:
            # device-eval path: one raw clip per sample (crops happen on
            # device), so padding is `pad` rows regardless of n_crops
            video = batch["raw_video"]
            video = np.concatenate(
                [video, np.zeros((pad,) + video.shape[1:], video.dtype)])
            return {"raw_video": video, "label": labels}
        video = batch["video"]
        video = np.concatenate(
            [video, np.zeros((pad * n_crops,) + video.shape[1:], video.dtype)])
        return {"video": video, "label": labels}

    # ------------------------------------------------------------------
    def current_lr(self, max_epochs):
        cfg = self.configs
        if getattr(cfg, "lr_schedule", "cosine") == "multistep":
            return schedules.multistep_epoch(self.epoch, cfg.lr)
        return schedules.cosine_with_warmup_epoch(
            self.epoch, cfg.lr, cfg.warmup_epochs, max_epochs,
            objective=cfg.objective, min_lr=getattr(cfg, "min_lr", 5e-5))

    def current_wd(self, max_epochs):
        cfg = self.configs
        return schedules.cosine_weight_decay(
            self.epoch, max_epochs, cfg.weight_decay,
            getattr(cfg, "weight_decay_end", cfg.weight_decay))

    # ------------------------------------------------------------------
    def train_epoch(self, loader, max_epochs, log_interval=30):
        cfg = self.configs
        lr = self.current_lr(max_epochs)
        wd = self.current_wd(max_epochs)
        self.train_meter.reset()
        data_start = time.perf_counter()
        from videotransformer_tpu.data.pipeline import device_prefetch

        for i, batch in enumerate(device_prefetch(loader, self.mesh)):
            data_time = time.perf_counter() - data_start
            key = jax.random.fold_in(self.base_key, self.global_step + 7919)
            self.params, self.opt_state, stats = self._train_step(
                self.params, self.opt_state, batch, key,
                jnp.float32(lr), jnp.float32(wd))
            self.global_step += 1
            if self.supervised:
                self.train_meter.update(
                    {1: stats["top1"], 5: stats["top5"]}, stats["bs"])
            if i % log_interval == 0:
                step_time = time.perf_counter() - data_start
                loss = float(stats["loss"])
                gn = float(stats["grad_norm"])
                msg = (f"epoch {self.epoch} step {i}/{len(loader)} "
                       f"loss {loss:.4f} lr {lr:.3e} grad_norm {gn:.3f} "
                       f"time {step_time:.3f} data_time {data_time:.3f}")
                if self.supervised and self.train_meter.total:
                    msg += (f" top1 {self.train_meter.compute(1):.3f}"
                            f" top5 {self.train_meter.compute(5):.3f}")
                self.print(msg)
            data_start = time.perf_counter()

        if self.supervised and self.train_meter.total:
            ts = time.strftime("%Y-%m-%d %H:%M:%S", time.localtime())
            self.print(
                f"{ts} - Evaluating mean top1_acc:{self.train_meter.compute(1):.3f},"
                f" top5_acc:{self.train_meter.compute(5):.3f} of current training epoch")
        # save last / periodic (model_trainer.py:244-252)
        if self.ckpt_dir:
            self.save_checkpoint(osp.join(self.ckpt_dir, "last_checkpoint"))
            if (not self.supervised
                    and (self.epoch + 1) % getattr(cfg, "save_ckpt_freq", 20) == 0):
                ts = time.strftime("%Y-%m-%d_%H-%M-%S", time.localtime())
                self.save_checkpoint(osp.join(self.ckpt_dir, f"{ts}_ep_{self.epoch}"))

    def validate(self, loader):
        if not (self.do_eval and self.supervised):
            return None
        from videotransformer_tpu.data.pipeline import device_prefetch

        self.val_meter.reset()
        padded = (self._pad_eval_batch(b, 1) for b in loader)
        for batch in device_prefetch(padded, self.mesh):
            stats = self._eval_step(self.params, batch, 1)
            self.val_meter.update({1: stats["top1"], 5: stats["top5"]}, stats["bs"])
        top1 = self.val_meter.compute(1)
        top5 = self.val_meter.compute(5)
        ts = time.strftime("%Y-%m-%d %H:%M:%S", time.localtime())
        self.print(f"{ts} - Evaluating mean top1_acc:{top1:.3f}, "
                   f"top5_acc:{top5:.3f} of current validation epoch")
        if self.ckpt_dir and top1 > self.max_top1_acc:
            self.save_checkpoint(
                osp.join(self.ckpt_dir,
                         f"{ts.replace(' ', '_').replace(':', '-')}_"
                         f"ep_{self.epoch}_top1_acc_{top1:.3f}"))
            self.max_top1_acc = top1
        return top1, top5

    def test(self, loader):
        if not (self.do_test and self.supervised):
            return None
        from videotransformer_tpu.data.pipeline import device_prefetch

        self.test_meter.reset()
        padded = (self._pad_eval_batch(b, self.n_crops) for b in loader)
        for batch in device_prefetch(padded, self.mesh):
            stats = self._eval_step(self.params, batch, self.n_crops)
            self.test_meter.update({1: stats["top1"], 5: stats["top5"]}, stats["bs"])
        top1, top5 = self.test_meter.compute(1), self.test_meter.compute(5)
        ts = time.strftime("%Y-%m-%d %H:%M:%S", time.localtime())
        self.print(f"{ts} - Evaluating mean top1_acc:{top1:.3f}, "
                   f"top5_acc:{top5:.3f} of current test epoch")
        return top1, top5

    def fit(self, data_module, max_epochs):
        for epoch in range(self.epoch, max_epochs):
            self.epoch = epoch
            train_loader = data_module.train_loader()
            train_loader.set_epoch(epoch)
            self.train_epoch(train_loader, max_epochs,
                             getattr(self.configs, "log_interval", 30))
            val_loader = data_module.val_loader()
            if val_loader is not None:
                self.validate(val_loader)
        test_loader = data_module.test_loader()
        if test_loader is not None:
            self.test(test_loader)
        self.wait_for_checkpoints()

    # ------------------------------------------------------------------
    def save_checkpoint(self, path, block=False):
        """Checkpoint without stalling training: snapshot params/opt-state
        on device (cheap HBM copy), then a background thread runs the slow
        device->host transfer and the orbax write while the next epoch
        computes. The reference (Lightning save_checkpoint,
        model_trainer.py:244-252) blocks the step loop for the whole write;
        on TPU the D2H readback dominates, so overlapping it is nearly free
        wall-clock. Saves are serialized (previous write joined first);
        `block=True` restores fully synchronous behavior."""
        import threading

        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        self.wait_for_checkpoints()  # at most one write in flight
        snap_params = jax.tree.map(jnp.copy, self._canonical_params())
        snap_opt = jax.tree.map(jnp.copy, self._canonical_opt_moments())
        epoch, step = np.int32(self.epoch + 1), np.int32(self.global_step)
        top1 = np.float32(self.max_top1_acc)

        def _write():
            payload = {
                "params": jax.device_get(snap_params),
                "opt_state": {
                    "step": jax.device_get(snap_opt[0]),
                    "mu": jax.device_get(snap_opt[1]),
                    "nu": jax.device_get(snap_opt[2]),
                },
                "epoch": epoch,
                "global_step": step,
                "max_top1_acc": top1,
            }
            ocp.PyTreeCheckpointer().save(path, payload, force=True)

        def _write_guarded():
            try:
                _write()
            except BaseException as e:  # surface in wait_for_checkpoints
                self._ckpt_error = e

        if block:
            _write()
            return
        self._ckpt_thread = threading.Thread(
            target=_write_guarded, name=f"ckpt-write-{path}", daemon=False)
        self._ckpt_thread.start()

    def wait_for_checkpoints(self):
        """Join any in-flight checkpoint write (call before load/exit).
        Re-raises an exception from the background writer so a failed
        last_checkpoint save is not silently discovered at resume time."""
        t = getattr(self, "_ckpt_thread", None)
        if t is not None and t.is_alive():
            t.join()
        self._ckpt_thread = None
        err = getattr(self, "_ckpt_error", None)
        if err is not None:
            self._ckpt_error = None
            raise RuntimeError("async checkpoint write failed") from err

    def load_checkpoint(self, path):
        import orbax.checkpoint as ocp

        from videotransformer_tpu.training.optimizer import RefOptState

        self.wait_for_checkpoints()
        ckpter = ocp.PyTreeCheckpointer()
        payload = ckpter.restore(os.path.abspath(path))
        self.params = self._place_params(payload["params"])
        self.opt_state = RefOptState(
            step=jnp.asarray(payload["opt_state"]["step"]),
            mu=self._place_opt_moment(payload["opt_state"]["mu"]),
            nu=self._place_opt_moment(payload["opt_state"]["nu"]),
        )
        self.epoch = int(payload["epoch"])
        self.global_step = int(payload["global_step"])
        self.max_top1_acc = float(payload["max_top1_acc"])

    def print(self, *args, **kwargs):
        if jax.process_index() == 0:
            print(*args, **kwargs, flush=True)
            if self._log_fh is not None:
                print(*args, **kwargs, file=self._log_fh, flush=True)
