"""CLI entry point — flag-compatible with the reference's model_pretrain.py.

All reference flags are kept (model_pretrain.py:21-152); TPU-native additions
are limited to device-mesh controls. Behavior parity (model_pretrain.py:154-230):
- linear LR scaling: lr *= batch_size * num_devices / 256 (:158-164), counting
  jax.device_count() instead of CUDA GPUs.
- exp-tag results/{tag}/{ckpt,log} directory scheme (:167-179).
- resume resolution to last_checkpoint (:190-192).
- seeding (:215-219) covers numpy, python random, and the JAX base key.

Mixed precision: '-use_fp16 True' maps to bf16 compute with fp32 params on TPU
(SURVEY §2.2: "TPU equivalent: bf16 compute / fp32 params+accumulators").
"""

import argparse
import os
import random
import time
import warnings

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="lr receiver")
    # Common
    parser.add_argument("-epoch", type=int, required=True,
                        help="the max epochs of training")
    parser.add_argument("-batch_size", type=int, required=True,
                        help="the batch size of data inputs")
    parser.add_argument("-num_workers", type=int, default=4,
                        help="the num workers of loading data")
    parser.add_argument("-resume", default=False, action="store_true")
    parser.add_argument("-resume_from_checkpoint", type=str, default=None,
                        help="the pretrain params from specific path")
    parser.add_argument("-log_interval", type=int, default=30,
                        help="the intervals of logging")
    parser.add_argument("-save_ckpt_freq", type=int, default=20,
                        help="the intervals of saving model")
    parser.add_argument("-objective", type=str, default="mim",
                        help="the learning objective from [mim, supervised]")
    parser.add_argument("-eval_metrics", type=str, default="finetune",
                        help="the eval metrics choosen from [linear_prob, finetune]")

    # Environment (gpus kept for CLI compatibility; device count comes from JAX)
    parser.add_argument("-gpus", nargs="+", type=int, default=-1,
                        help="kept for compatibility; devices come from jax.devices()")
    parser.add_argument("-root_dir", type=str, required=True,
                        help="the path to root dir for work space")

    # Data
    parser.add_argument("-num_class", type=int, required=True)
    parser.add_argument("-num_samples_per_cls", type=int, default=10000)
    parser.add_argument("-img_size", type=int, default=224)
    parser.add_argument("-num_frames", type=int, required=True)
    parser.add_argument("-frame_interval", type=int, required=True)
    parser.add_argument("-data_statics", type=str, default="kinetics",
                        help="choose data statics from [imagenet, kinetics]")
    parser.add_argument("-train_data_path", type=str, required=True)
    parser.add_argument("-val_data_path", type=str, default=None)
    parser.add_argument("-test_data_path", type=str, default=None)
    parser.add_argument("-multi_crop", type=bool, default=False)
    parser.add_argument("-mixup", type=bool, default=False)
    parser.add_argument("-auto_augment", type=str, default=None)

    # Model
    parser.add_argument("-arch", type=str, default="timesformer",
                        help="the choosen model arch from [timesformer, vivit, mvit]")
    parser.add_argument("-attention_type", type=str, default="divided_space_time")
    parser.add_argument("-pretrain_pth", type=str, default=None)
    parser.add_argument("-weights_from", type=str, default="imagenet",
                        help="the pretrain params from [imagenet, kinetics]")

    # Training/Optimization parameters
    parser.add_argument("-seed", type=int, default=0)
    parser.add_argument("-optim_type", type=str, default="adamw")
    parser.add_argument("-lr_schedule", type=str, default="cosine")
    parser.add_argument("-lr", type=float, required=True)
    parser.add_argument("-layer_decay", type=float, default=0.75)
    parser.add_argument("--min_lr", type=float, default=1e-6)
    parser.add_argument("-use_fp16", type=bool, default=True,
                        help="bf16 compute / fp32 params on TPU")
    parser.add_argument("-weight_decay", type=float, default=0.05)
    parser.add_argument("-weight_decay_end", type=float, default=0.05)
    parser.add_argument("-clip_grad", type=float, default=0)
    parser.add_argument("-warmup_epochs", default=5, type=int)

    # TPU-native extension (not in the reference): decode fixed-size uint8
    # clips and run all train augmentation on device inside the jitted step
    parser.add_argument("-device_augment", type=bool, default=False)
    parser.add_argument("-device_hog", type=bool, default=False,
                        help="mim only: compute HOG targets on device inside "
                             "the jitted step instead of the host per-frame "
                             "loop (implied by -device_augment)")
    parser.add_argument("-aug_scale", type=float, nargs=2, default=[0.08, 1.0],
                        help="RandomResizedCrop area range of the device "
                             "augment path (timm default 0.08 1.0)")
    parser.add_argument("-aug_hflip", type=float, default=0.5,
                        help="horizontal-flip probability (device augment)")
    parser.add_argument("-aug_color", type=float, nargs=4,
                        default=[0.4, 0.4, 0.4, 0.0],
                        help="brightness/contrast/saturation/hue jitter "
                             "strengths (device augment)")
    parser.add_argument("-classmap_path", type=str, default=None,
                        help="custom classmap json (defaults to bundled "
                             "k400/k600 maps by num_class)")
    parser.add_argument("-video_root", type=str, default=None,
                        help="root dir for relative annotation rows "
                             "(default: the annotation file's directory)")
    parser.add_argument("-remat", type=bool, default=False,
                        help="activation rematerialization (jax.checkpoint) "
                             "per transformer block: less HBM, ~30%% more step time")
    parser.add_argument("-fused_adamw", type=bool, default=True,
                        help="fuse small float32 param leaves into one flat "
                             "blocked buffer for the AdamW update "
                             "(optimizer.py flat_small; wall-neutral on the "
                             "bench host, far fewer scheduled ops; auto-off "
                             "when a model mesh axis shards params)")
    parser.add_argument("-tp", type=int, default=1,
                        help="tensor-parallel mesh axis size (parallel/tp.py: "
                             "Megatron column/row shardings; must divide the "
                             "head count)")
    parser.add_argument("-sp", type=int, default=1,
                        help="sequence-parallel mesh axis size (parallel/"
                             "sp.py: tokens sharded across chips; divided "
                             "space-time only — must divide num_frames and "
                             "the patch count)")
    parser.add_argument("-pp", type=int, default=1,
                        help="pipeline-parallel stage count (parallel/pp.py "
                             "GPipe over a 'pipe' mesh axis; supervised "
                             "timesformer/vivit, composes with data "
                             "parallelism; must divide the layer count)")
    parser.add_argument("-pp_microbatch", type=int, default=0,
                        help="GPipe microbatches per step (0 = pp stage "
                             "count); more microbatches shrink the pipeline "
                             "bubble but must divide the batch size")
    parser.add_argument("-scan_layers", type=bool, default=False,
                        help="run the transformer block stack as one "
                             "lax.scan over stacked per-layer params "
                             "(training/stacked_trainer.py). Same numerics "
                             "and pp-interchangeable checkpoints; NB on v5e "
                             "at 12 layers this measured SLOWER than the "
                             "unrolled default (see the module docstring) — "
                             "opt-in for much deeper stacks or HLO-size-"
                             "bound builds")

    return parser.parse_args(argv)


def _resolve_resume_checkpoint(ckpt_dir):
    """-resume points at last_checkpoint (model_pretrain.py:190-192); if a
    crash interrupted that write (orbax names the in-flight dir
    '<name>.orbax-checkpoint-tmp-<timestamp>' — TMP_DIR_SUFFIX plus a
    timestamp, so substring-match rather than endswith), fall back to the
    newest COMPLETE checkpoint in the run dir instead of silently starting
    from scratch."""
    last = os.path.join(ckpt_dir, "last_checkpoint")
    if os.path.exists(last):
        return last
    candidates = [
        os.path.join(ckpt_dir, d) for d in os.listdir(ckpt_dir)
        if ".orbax-checkpoint-tmp" not in d
        and os.path.isdir(os.path.join(ckpt_dir, d))
    ] if os.path.isdir(ckpt_dir) else []
    if not candidates:
        return last  # nothing to resume; caller's exists() check skips it
    return max(candidates, key=os.path.getmtime)


def validate_parallel_flags(args):
    """Fail fast on -tp/-sp values the model geometry can't shard.

    parallel/tp.shard_params_tp would otherwise quietly fall back to
    replication for non-divisible leaves — a `-tp 5` run would train
    CORRECTLY but with tensor parallelism silently off for exactly the
    kernels it was requested for. B/16 geometry: 12 heads; patch grid
    (img_size/16)^2; ViViT's tubelet embed halves the frame count."""
    tp, sp = getattr(args, "tp", 1), getattr(args, "sp", 1)
    if tp > 1:
        if args.arch == "mvit":
            raise SystemExit(
                "-tp > 1 is not supported for -arch mvit: MViT's per-block "
                "head counts start at 1 (stage 0), which no model-axis size "
                "can split. Use -sp/-pp or data parallelism.")
        num_heads = 12  # B/16 builders (models/timesformer.py, vivit.py)
        if num_heads % tp:
            raise SystemExit(
                f"-tp {tp} does not divide the attention head count "
                f"({num_heads} for {args.arch}-B/16); pick tp in "
                f"{[d for d in range(1, num_heads + 1) if num_heads % d == 0]}. "
                "Non-divisible tp would silently replicate the qkv/ffn "
                "params and run without tensor parallelism.")
    if sp > 1:
        if args.attention_type not in ("divided_space_time", "fact_encoder"):
            raise SystemExit(
                f"-sp > 1 requires divided attention rows "
                f"(attention_type divided_space_time/fact_encoder), got "
                f"{args.attention_type}")
        frames = args.num_frames // 2 if args.arch == "vivit" else args.num_frames
        patches = (args.img_size // 16) ** 2
        if frames % sp or patches % sp:
            raise SystemExit(
                f"-sp {sp} must divide both the (effective) frame count "
                f"({frames}) and the patch count ({patches}); a "
                f"non-divisible sp falls back to unsharded attention rows.")


def single_run(argv=None):
    args = parse_args(argv)
    validate_parallel_flags(args)
    warnings.filterwarnings("ignore")

    import jax

    # persistent XLA compilation cache: a resumed/restarted run skips the
    # multi-minute 12-layer train-step compile (JAX_COMPILATION_CACHE_DIR
    # overrides; keyed under root_dir so experiments share compiles)
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        cache_dir = os.path.join(args.root_dir, "jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    # multi-host: initialize the distributed runtime when launched under a
    # multi-process coordinator (no-op on a single host)
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
        except Exception as e:  # already initialized / single-process
            print(f"jax.distributed.initialize skipped: {e}")

    from videotransformer_tpu.data import transforms as T
    from videotransformer_tpu.training.data_module import KineticsDataModule
    from videotransformer_tpu.training.trainer import VideoTransformerTrainer

    # linear learning rate scale over the DATA-parallel chips
    # (model_pretrain.py:158-164); seq/tensor/pipeline-parallel chips share
    # one batch shard, so they don't scale the effective batch
    num_devices = jax.device_count() // (args.sp * args.tp * args.pp)
    effective_batch_size = args.batch_size * num_devices
    args.lr = args.lr * effective_batch_size / 256

    ROOT_DIR = args.root_dir
    exp_tag = (
        f"objective_{args.objective}_arch_{args.arch}_lr_{args.lr}_"
        f"optim_{args.optim_type}_lr_schedule_{args.lr_schedule}_"
        f"fp16_{args.use_fp16}_weight_decay_{args.weight_decay}_"
        f"weight_decay_end_{args.weight_decay_end}_warmup_epochs_{args.warmup_epochs}_"
        f"pretrain_{args.pretrain_pth}_weights_from_{args.weights_from}_seed_{args.seed}_"
        f"img_size_{args.img_size}_num_frames_{args.num_frames}_eval_metrics_{args.eval_metrics}_"
        f"frame_interval_{args.frame_interval}_mixup_{args.mixup}_"
        f"multi_crop_{args.multi_crop}_auto_augment_{args.auto_augment}_"
    )
    # the full tag can exceed the 255-char filename limit; keep it readable
    # but truncate with a stable hash suffix
    if len(exp_tag) > 200:
        import hashlib

        digest = hashlib.sha1(exp_tag.encode()).hexdigest()[:10]
        exp_tag = exp_tag[:188] + "_" + digest
    ckpt_dir = os.path.join(ROOT_DIR, f"results/{exp_tag}/ckpt")
    log_dir = os.path.join(ROOT_DIR, f"results/{exp_tag}/log")
    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(log_dir, exist_ok=True)

    do_eval = args.val_data_path is not None
    do_test = args.test_data_path is not None

    # To be reproducible (model_pretrain.py:215-219)
    np.random.seed(args.seed)
    random.seed(args.seed)
    T.seed_transforms(args.seed)

    data_module = KineticsDataModule(
        configs=args,
        train_ann_path=args.train_data_path,
        val_ann_path=args.val_data_path,
        test_ann_path=args.test_data_path,
    )

    if args.resume and not args.resume_from_checkpoint:
        args.resume_from_checkpoint = _resolve_resume_checkpoint(ckpt_dir)

    trainer_cls = VideoTransformerTrainer
    if args.pp > 1:
        from videotransformer_tpu.training.pp_trainer import PipelineTrainer

        trainer_cls = PipelineTrainer
    elif args.scan_layers:
        from videotransformer_tpu.training.stacked_trainer import (
            ScanLayersTrainer)

        trainer_cls = ScanLayersTrainer
    trainer = trainer_cls(
        configs=args, ckpt_dir=ckpt_dir, do_eval=do_eval, do_test=do_test,
        log_dir=log_dir)

    if args.resume_from_checkpoint and os.path.exists(args.resume_from_checkpoint):
        if jax.process_index() == 0:
            print(f"resuming from {args.resume_from_checkpoint}", flush=True)
        trainer.load_checkpoint(args.resume_from_checkpoint)

    if jax.process_index() == 0:
        print(args, flush=True)
        ts = time.strftime("%Y-%m-%d %H:%M:%S", time.localtime())
        print(f"{ts} - INFO - Start running,", flush=True)
    trainer.fit(data_module, args.epoch)
    return trainer


if __name__ == "__main__":
    single_run()
