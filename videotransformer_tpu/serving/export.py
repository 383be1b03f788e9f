"""AOT serving artifacts via jax.export (StableHLO).

Production TPU serving wants a sealed, code-free artifact: the predict
function is traced and lowered ONCE at export time, serialized as
StableHLO bytes alongside the weights, and reloaded with
``jax.export.deserialize`` — no flax model code at serve time, no
retracing, and identical HLO across processes (so the persistent compile
cache hits). The exported function implements the reference's notebook
inference semantics — per-crop logits averaged over the ThreeCrop stack
(notebook/VideoTransformer_demo.ipynb cells 13-15, SURVEY §3.4) — for a
fixed list of clip-batch buckets; the server pads every request batch to
the next bucket so each shape is a precompiled program.

Artifact layout (a directory):
    manifest.json       {arch-free geometry: frames, crops, classes,
                         buckets, input dtype/shape template}
    predict_b{B}.shlo   serialized jax.export artifact per bucket
    params.npz          flat {"path/to/leaf": array} model + head params
"""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export


def flatten_params(tree):
    """Pytree -> {"a/b/c": leaf} with '/'-joined key paths."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {
        "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(leaf)
        for path, leaf in flat
    }


def unflatten_params(flat):
    """Inverse of flatten_params (nested dicts)."""
    tree = {}
    for path, leaf in flat.items():
        node = tree
        keys = path.split("/")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = jnp.asarray(leaf)
    return tree


def make_predict_fn(model, head, num_class, n_crops):
    """(params, head_params, clips (B, n_crops, T, C, H, W)) -> (B, num_class)
    crop-averaged logits — the notebook's ``output.view(-1, 3, 400).mean(1)``
    (cells 13-15)."""

    def predict(params, head_params, clips):
        b, nc, t, c, h, w = clips.shape
        feats = model.apply({"params": params},
                            clips.reshape(b * nc, t, c, h, w))
        logits = head.apply({"params": head_params}, feats)
        return logits.reshape(b, nc, num_class).mean(axis=1)

    return predict


def export_predictor(path, model, head, params, head_params, *, num_frames,
                     num_class, img_size=224, n_crops=3, buckets=(1, 2, 4, 8),
                     platforms=("cpu", "tpu")):
    """Write a sealed serving artifact directory (see module docstring).

    One StableHLO program per batch bucket; weights in params.npz. The
    artifact is portable across processes and machines with the same
    jax major version (jax.export's serialization guarantee)."""
    os.makedirs(path, exist_ok=True)
    predict = make_predict_fn(model, head, num_class, n_crops)
    buckets = sorted(set(int(b) for b in buckets))

    flat = {f"model/{k}": v for k, v in flatten_params(params).items()}
    flat.update({f"head/{k}": v for k, v in flatten_params(head_params).items()})
    np.savez(os.path.join(path, "params.npz"), **flat)

    for b in buckets:
        spec = jax.ShapeDtypeStruct(
            (b, n_crops, num_frames, 3, img_size, img_size), jnp.float32)
        p_spec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
        h_spec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), head_params)
        exported = jax_export.export(
            jax.jit(predict), platforms=list(platforms))(p_spec, h_spec, spec)
        with open(os.path.join(path, f"predict_b{b}.shlo"), "wb") as f:
            f.write(exported.serialize())

    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump({
            "num_frames": num_frames, "num_class": num_class,
            "img_size": img_size, "n_crops": n_crops, "buckets": buckets,
            "platforms": list(platforms),
        }, f, indent=1)


class ExportedPredictor:
    """Callable over a serving artifact directory: pads the clip batch to
    the next bucket, runs the matching precompiled program, unpads."""

    def __init__(self, path):
        with open(os.path.join(path, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.buckets = self.manifest["buckets"]
        self.num_class = self.manifest["num_class"]
        self.n_crops = self.manifest["n_crops"]
        self._fns = {}
        for b in self.buckets:
            with open(os.path.join(path, f"predict_b{b}.shlo"), "rb") as f:
                self._fns[b] = jax_export.deserialize(f.read()).call
        flat = np.load(os.path.join(path, "params.npz"))
        params = {k[len("model/"):]: flat[k] for k in flat.files
                  if k.startswith("model/")}
        head = {k[len("head/"):]: flat[k] for k in flat.files
                if k.startswith("head/")}
        self.params = unflatten_params(params)
        self.head_params = unflatten_params(head)

    @property
    def max_batch(self):
        return self.buckets[-1]

    def _bucket(self, n):
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def __call__(self, clips):
        """clips (B, n_crops, T, C, H, W) float32 -> (B, num_class) logits.
        B may exceed the largest bucket; chunks are run back to back."""
        clips = jnp.asarray(clips, jnp.float32)
        n = clips.shape[0]
        out = []
        i = 0
        while i < n:
            take = min(n - i, self.max_batch)
            b = self._bucket(take)
            chunk = clips[i:i + take]
            if take < b:
                pad = jnp.zeros((b - take,) + chunk.shape[1:], chunk.dtype)
                chunk = jnp.concatenate([chunk, pad], axis=0)
            logits = self._fns[b](self.params, self.head_params, chunk)
            out.append(logits[:take])
            i += take
        return jnp.concatenate(out, axis=0)

    def warmup(self):
        """Compile every bucket once (serving wants no first-request
        compile stalls)."""
        shape = (1, self.n_crops, self.manifest["num_frames"], 3,
                 self.manifest["img_size"], self.manifest["img_size"])
        for b in self.buckets:
            clips = jnp.zeros((b,) + shape[1:], jnp.float32)
            jax.block_until_ready(
                self._fns[b](self.params, self.head_params, clips))


def load_predictor(path) -> ExportedPredictor:
    return ExportedPredictor(path)
