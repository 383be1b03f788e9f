"""Optimizer builders, parity with reference optimizer.py.

Reference rules reproduced on pytrees:
- pretrain/no-layer-decay: two groups — no_decay (1-D params, ``bias`` leaves,
  skip keywords {pos_embed, cls_token, mask_token}) with wd=0, decay with wd
  (optimizer.py:43-62). AdamW(0.9, 0.999) or SGD(momentum .9, nesterov)
  (optimizer.py:33-38, 90-95).
- mvit finetune: layer-wise LR decay — 16 blocks -> 18 layer ids
  (``get_mvit_layer``: mask_token/patch_embed/cls_positional_encoding -> 0,
  blocks.i -> i+1, rest -> 17), scale = layer_decay ** (num_layers+1-id)
  (optimizer.py:66-111, 114-158).
- per-parameter gradient clipping returning the total norm
  (model_trainer.py:155-170): each parameter's grad is clipped to
  ``clip_grad`` by its own L2 norm; the logged total is the norm of the
  per-param norms. NOTE: this is NOT global-norm clipping.
- the cosine weight-decay schedule applies only to the decay group
  (model_trainer.py:150-153); we thread a scalar ``wd`` into the update.

Implementation: a single custom optax-style transformation whose update takes
(lr, wd) scalars; torch-AdamW semantics (decoupled wd scaled by group lr).
The whole update is jit-compatible and mesh-agnostic (pure pytree math).
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

SKIP_KEYWORDS = ("pos_embed", "cls_token", "mask_token")


def _flatten_with_paths(params):
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    paths = ["/".join(str(getattr(k, "key", k)) for k in path) for path, _ in flat]
    leaves = [leaf for _, leaf in flat]
    return paths, leaves, treedef


def no_decay_mask(params, skip_keywords=SKIP_KEYWORDS):
    """True where weight decay must NOT apply (optimizer.py:52-53)."""
    paths, leaves, treedef = _flatten_with_paths(params)
    mask = []
    for path, leaf in zip(paths, leaves):
        nd = (
            leaf.ndim == 1
            or path.endswith("bias")
            or any(k in path for k in skip_keywords)
        )
        mask.append(nd)
    return jax.tree_util.tree_unflatten(treedef, mask)


def mvit_layer_id(path: str, num_layers: int = 18) -> int:
    """optimizer.py:100-111 on flax param paths."""
    p = path.replace("model/", "").replace("mvit/", "")
    if p.startswith("mask_token"):
        return 0
    if p.startswith("patch_embed") or p.startswith("cls_positional_encoding"):
        return 0
    if p.startswith("blocks"):
        # blocks_3/... -> 3   (flax naming) or blocks/3/...
        seg = p.split("/")[0]
        if "_" in seg:
            return int(seg.split("_")[-1]) + 1
        return int(p.split("/")[1]) + 1
    return num_layers - 1


def layer_scale_tree(params, layer_decay: float, num_layers: int = 18):
    """Per-param lr scale = layer_decay ** (num_layers - 1 - layer_id)
    (optimizer.py:73: scales list is reversed)."""
    paths, leaves, treedef = _flatten_with_paths(params)
    scales = [
        layer_decay ** (num_layers - 1 - mvit_layer_id(p, num_layers)) for p in paths
    ]
    return jax.tree_util.tree_unflatten(treedef, scales)


class RefOptState(NamedTuple):
    step: jnp.ndarray
    mu: Any  # adam first moment / sgd momentum buffer
    nu: Any  # adam second moment (zeros tree for sgd)


class RefOptimizer:
    """AdamW / SGD-nesterov with the reference's group rules.

    update(grads, state, params, lr, wd) -> (new_params, new_state, grad_norm)
    lr and wd are scalars computed by the epoch schedules; per-param lr scale
    (layer decay) and the no-decay mask are baked in at build time.
    """

    def __init__(self, optim_type="adamw", betas=(0.9, 0.999), eps=1e-8,
                 momentum=0.9, nesterov=True, clip_grad=0.0,
                 nd_mask=None, lr_scales=None, stacked_mask=None):
        self.optim_type = optim_type.lower()
        self.betas = betas
        self.eps = eps
        self.momentum = momentum
        self.nesterov = nesterov
        self.clip_grad = clip_grad
        self.nd_mask = nd_mask
        self.lr_scales = lr_scales
        # stacked_mask: bool pytree — True on leaves whose LEADING axis is a
        # stacked per-layer axis (pipeline parallelism stacks the L block
        # subtrees, parallel/pp.py). The per-PARAMETER clip must then act per
        # leading slice, so clipping under pp matches the unstacked reference
        # semantics exactly (model_trainer.py:155-170 is per tensor).
        self.stacked_mask = stacked_mask

    def init(self, params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return RefOptState(step=jnp.zeros((), jnp.int32), mu=zeros,
                           nu=jax.tree.map(jnp.zeros_like, params))

    def _clip(self, grads):
        """Per-parameter clip (model_trainer.py:155-170). Returns total norm
        of per-param norms (the reference's logged grad_norm). Stacked
        (per-layer) leaves are clipped per leading slice — each original
        layer tensor keeps its own norm."""
        sm = self.stacked_mask or jax.tree.map(lambda _: False, grads)

        def norm_one(g, stacked):
            if stacked:
                return jnp.sqrt((g.reshape(g.shape[0], -1) ** 2).sum(axis=1))
            return jnp.linalg.norm(g.reshape(-1))

        norms = jax.tree.map(norm_one, grads, sm)
        total = jnp.sqrt(sum(jnp.sum(n**2) for n in jax.tree.leaves(norms)))
        if self.clip_grad and self.clip_grad > 0:
            def clip_one(g, n, stacked):
                coef = self.clip_grad / (n + 1e-6)
                if stacked:
                    coef = coef.reshape((g.shape[0],) + (1,) * (g.ndim - 1))
                return jnp.where(coef < 1, g * coef, g)

            grads = jax.tree.map(clip_one, grads, norms, sm)
        return grads, total

    def update(self, grads, state, params, lr, wd):
        grads, grad_norm = self._clip(grads)
        step = state.step + 1

        nd = self.nd_mask or jax.tree.map(lambda _: False, params)
        scales = self.lr_scales or jax.tree.map(lambda _: 1.0, params)

        if self.optim_type == "adamw":
            b1, b2 = self.betas
            mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
            nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
            bc1 = 1 - b1 ** step.astype(jnp.float32)
            bc2 = 1 - b2 ** step.astype(jnp.float32)

            def apply_one(p, m, v, is_nd, scale):
                step_lr = lr * scale
                this_wd = jnp.where(is_nd, 0.0, wd)
                # torch AdamW: p *= (1 - lr*wd); p -= lr * mhat/(sqrt(vhat)+eps)
                p = p * (1 - step_lr * this_wd)
                return p - step_lr * (m / bc1) / (jnp.sqrt(v / bc2) + self.eps)

            new_params = jax.tree.map(apply_one, params, mu, nu, nd, scales)
            return new_params, RefOptState(step, mu, nu), grad_norm

        elif self.optim_type == "sgd":
            def sgd_one(p, buf, g, is_nd, scale):
                this_wd = jnp.where(is_nd, 0.0, wd)
                # torch SGD: d = g + wd*p; buf = momentum*buf + d;
                # nesterov: d = d + momentum*buf; p -= lr*d
                d = g + this_wd * p
                new_buf = self.momentum * buf + d
                if self.nesterov:
                    d = d + self.momentum * new_buf
                else:
                    d = new_buf
                return p - lr * scale * d, new_buf

            flat_p, treedef = jax.tree.flatten(params)
            flat_b = jax.tree.leaves(state.mu)
            flat_g = jax.tree.leaves(grads)
            flat_nd = jax.tree.leaves(nd)
            flat_s = jax.tree.leaves(scales)
            outs = [sgd_one(p, b, g, n, s) for p, b, g, n, s in
                    zip(flat_p, flat_b, flat_g, flat_nd, flat_s)]
            new_params = jax.tree.unflatten(treedef, [o[0] for o in outs])
            new_mu = jax.tree.unflatten(treedef, [o[1] for o in outs])
            return new_params, RefOptState(step, new_mu, state.nu), grad_norm

        raise ValueError(self.optim_type)


def build_optimizer(hparams, params, is_pretrain: bool) -> RefOptimizer:
    """reference optimizer.py:14-18 on a flax param tree.

    hparams needs: optim_type, arch, layer_decay, clip_grad (others are
    threaded per-step: lr, weight_decay).
    """
    nd = no_decay_mask(params)
    lr_scales = None
    if not is_pretrain and getattr(hparams, "arch", None) == "mvit":
        if hparams.layer_decay != 1:
            lr_scales = layer_scale_tree(params, hparams.layer_decay, num_layers=18)
    return RefOptimizer(
        optim_type=hparams.optim_type,
        clip_grad=getattr(hparams, "clip_grad", 0.0),
        nd_mask=nd,
        lr_scales=lr_scales,
    )
