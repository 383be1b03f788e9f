"""Export a trained model as a sealed serving artifact.

Completes the serving story end to end: this CLI loads weights (a
reference-format torch ``.pth`` through the kinetics import surgery, or
an orbax train-state checkpoint), builds the inference model, and writes
the jax.export artifact directory that ``python -m
videotransformer_tpu.serving.server`` serves. The inference semantics
are the reference notebook's (cells 6-15; crop-mean logits).

Usage:
    python -m videotransformer_tpu.tools.export_serving \
        --out /tmp/artifact --arch timesformer --ckpt k400.pth \
        [--num_frames 8] [--num_class 400] [--buckets 1,2,4,8]
"""

import argparse

import jax
import jax.numpy as jnp

from videotransformer_tpu.ops.blocks import ClassificationHead
from videotransformer_tpu.serving.export import export_predictor
from videotransformer_tpu.tools.demo_inference import build_model


def _load_weights(args, model, head, params, head_params):
    if args.ckpt is None:
        return params, head_params  # fresh init (smoke/demo export)
    if args.ckpt_format == "torch":
        from videotransformer_tpu.models.convert import (
            init_from_kinetics_pretrain, load_torch_state_dict, merge_params,
            replace_state_dict, torch_to_flax_params)

        params = init_from_kinetics_pretrain(
            params, args.ckpt,
            args.attention_type or ("divided_space_time"
                                    if args.arch == "timesformer"
                                    else "fact_encoder"))
        sd = replace_state_dict(load_torch_state_dict(args.ckpt))
        head_sd = {k: v for k, v in sd.items() if k.startswith("cls_head")}
        if head_sd:
            head_params, _, _ = merge_params(
                head_params, torch_to_flax_params(head_sd))
        return params, head_params
    # orbax train-state checkpoint (training/trainer.py layout)
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(args.ckpt)
    state = restored.get("params", restored)
    return state.get("model", params), state.get("cls_head", head_params)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--arch", default="timesformer",
                   choices=["timesformer", "vivit"])
    p.add_argument("--attention_type", default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--ckpt_format", default="torch",
                   choices=["torch", "orbax"])
    p.add_argument("--num_frames", type=int, default=8)
    p.add_argument("--num_class", type=int, default=400)
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--n_crops", type=int, default=3)
    p.add_argument("--buckets", default="1,2,4,8")
    p.add_argument("--platforms", default="cpu,tpu")
    p.add_argument("--input_mode", default="clips", choices=["clips", "raw"],
                   help="'raw' ships canonical uint8 clips and runs the eval "
                        "preprocessing inside the exported program (~7x "
                        "less transfer per request)")
    p.add_argument("--raw_hw", type=int, nargs=2, default=[256, 342],
                   help="canonical raw-clip (height, width) for --input_mode "
                        "raw (the dataset raw_clips canonical size)")
    args = p.parse_args(argv)

    model = build_model(args.arch, args.num_frames, args.attention_type)
    head = ClassificationHead(args.num_class, model.embed_dims)
    clip = jnp.zeros((args.n_crops, args.num_frames, 3, args.img_size,
                      args.img_size), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), clip)["params"]
    head_params = jax.jit(head.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, model.embed_dims)))["params"]
    params, head_params = _load_weights(args, model, head, params,
                                        head_params)

    buckets = tuple(int(b) for b in args.buckets.split(","))
    export_predictor(
        args.out, model, head, params, head_params,
        num_frames=args.num_frames, num_class=args.num_class,
        img_size=args.img_size, n_crops=args.n_crops, buckets=buckets,
        platforms=tuple(args.platforms.split(",")),
        input_mode=args.input_mode, raw_hw=tuple(args.raw_hw))
    print(f"wrote serving artifact to {args.out} (buckets {list(buckets)}, "
          f"input_mode {args.input_mode})")


if __name__ == "__main__":
    main()
