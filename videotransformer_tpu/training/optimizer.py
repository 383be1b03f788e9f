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


class _FlatMeta(NamedTuple):
    """Static partition of a param tree into a fused-flat small-leaf group
    and a per-tensor big-leaf group (see RefOptimizer flat_small)."""
    treedef: Any
    small_idx: tuple          # leaf positions in the flat small group, in order
    big_idx: tuple            # leaf positions updated per-tensor
    shapes: tuple             # small-leaf shapes, group order
    starts: tuple             # element offsets into the padded flat buffer
    sizes: tuple              # unpadded element counts
    n_pad: int                # padded flat length (multiple of block)
    block: int
    block_seg: jnp.ndarray    # (n_blocks,) int32: segment id per block
    wd_block: jnp.ndarray     # (n_blocks, 1) f32: 0 where no_decay
    scale_block: jnp.ndarray  # (n_blocks, 1) f32: layer-decay lr scale
    pad_mask: jnp.ndarray     # (n_blocks, block) f32: 1 on real elements


def _build_flat_meta(params, nd_mask, lr_scales, threshold, block=512):
    """Group all float32 leaves with < threshold elements into one padded
    flat buffer; each leaf is padded to a whole number of `block`-element
    blocks so per-PARAM reductions (the reference's per-tensor clip norm)
    become exact blocked sums — no long-cumsum precision loss."""
    import numpy as np

    flat, treedef = jax.tree_util.tree_flatten(params)
    nd = jax.tree_util.tree_leaves(nd_mask) if nd_mask else [False] * len(flat)
    sc = jax.tree_util.tree_leaves(lr_scales) if lr_scales else [1.0] * len(flat)
    small_idx, big_idx = [], []
    for i, leaf in enumerate(flat):
        if leaf.dtype == jnp.float32 and leaf.size < threshold:
            small_idx.append(i)
        else:
            big_idx.append(i)
    if len(small_idx) < 8:
        return None  # nothing worth fusing
    shapes, starts, sizes = [], [], []
    block_seg, wd_b, sc_b, pad_rows = [], [], [], []
    off = 0
    for s, i in enumerate(small_idx):
        leaf = flat[i]
        n = int(leaf.size)
        nb = -(-n // block)
        shapes.append(tuple(leaf.shape))
        starts.append(off)
        sizes.append(n)
        block_seg += [s] * nb
        wd_b += [0.0 if nd[i] else 1.0] * nb
        sc_b += [float(sc[i])] * nb
        for b in range(nb):
            real = min(block, n - b * block)
            row = np.zeros((block,), np.float32)
            row[:real] = 1.0
            pad_rows.append(row)
        off += nb * block
    return _FlatMeta(
        treedef=treedef, small_idx=tuple(small_idx), big_idx=tuple(big_idx),
        shapes=tuple(shapes), starts=tuple(starts), sizes=tuple(sizes),
        n_pad=off, block=block,
        block_seg=jnp.asarray(block_seg, jnp.int32),
        wd_block=jnp.asarray(wd_b, jnp.float32)[:, None],
        scale_block=jnp.asarray(sc_b, jnp.float32)[:, None],
        pad_mask=jnp.asarray(np.stack(pad_rows), jnp.float32),
    )


def _flatten_small(meta: _FlatMeta, leaves):
    """Pack the small-group leaves into one (n_pad,) f32 vector."""
    parts = []
    for s, i in enumerate(meta.small_idx):
        v = leaves[i].astype(jnp.float32).ravel()
        pad = (meta.starts[s + 1] if s + 1 < len(meta.starts) else meta.n_pad) \
            - meta.starts[s] - meta.sizes[s]
        parts.append(jnp.pad(v, (0, pad)) if pad else v)
    return jnp.concatenate(parts)


def _unflatten_small(meta: _FlatMeta, vec, like_leaves):
    """Slice the flat vector back into small-group leaf shapes."""
    out = []
    for s, i in enumerate(meta.small_idx):
        n = meta.sizes[s]
        piece = jax.lax.slice(vec, (meta.starts[s],), (meta.starts[s] + n,))
        out.append(piece.reshape(meta.shapes[s]).astype(like_leaves[i].dtype))
    return out


class RefOptimizer:
    """AdamW / SGD-nesterov with the reference's group rules.

    update(grads, state, params, lr, wd) -> (new_params, new_state, grad_norm)
    lr and wd are scalars computed by the epoch schedules; per-param lr scale
    (layer decay) and the no-decay mask are baked in at build time.
    """

    def __init__(self, optim_type="adamw", betas=(0.9, 0.999), eps=1e-8,
                 momentum=0.9, nesterov=True, clip_grad=0.0,
                 nd_mask=None, lr_scales=None, stacked_mask=None,
                 flat_small=False, flat_threshold=1 << 18):
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
        # flat_small: fuse every small (< flat_threshold elements) float32
        # leaf into ONE padded flat buffer for the AdamW update. MViT's
        # MaskFeat step otherwise issues ~150 per-tensor update fusions at
        # ~40 us op-issue each (~6 ms of an ~84 ms step — trace_step.py
        # --config maskfeat); the flat group collapses them into a handful
        # of big blocked ops. Same math, same clip semantics (per-PARAM
        # norms from exact blocked segment sums). Moments are STORED flat
        # at runtime; canonical_moments()/runtime_moments() convert to/from
        # the checkpoint tree so checkpoints stay layout-independent.
        self.flat_small = flat_small and self.optim_type == "adamw" \
            and not (stacked_mask and any(jax.tree_util.tree_leaves(stacked_mask)))
        self.flat_threshold = flat_threshold
        self._meta = None

    def init(self, params):
        if self.flat_small and self._meta is None:
            self._meta = _build_flat_meta(
                params, self.nd_mask, self.lr_scales, self.flat_threshold)
        zeros = jax.tree.map(jnp.zeros_like, params)
        if self._meta is not None:
            # mu and nu must not alias the same buffers (the jitted step
            # donates opt_state; aliased leaves would be donated twice)
            zeros2 = jax.tree.map(jnp.zeros_like, params)
            return RefOptState(step=jnp.zeros((), jnp.int32),
                               mu=self.runtime_moments(zeros),
                               nu=self.runtime_moments(zeros2))
        return RefOptState(step=jnp.zeros((), jnp.int32), mu=zeros,
                           nu=jax.tree.map(jnp.zeros_like, params))

    # -- flat-group moment layout converters (checkpoint canonicalization) --
    def runtime_moments(self, tree):
        """Canonical moment tree -> runtime layout (flat small group)."""
        if self._meta is None:
            return tree
        m = self._meta
        leaves = jax.tree_util.tree_leaves(tree)
        return {"flat": _flatten_small(m, leaves),
                "big": [leaves[i] for i in m.big_idx]}

    def canonical_moments(self, moment):
        """Runtime moment layout -> the canonical checkpoint tree."""
        if self._meta is None:
            return moment
        m = self._meta
        n_leaves = len(m.small_idx) + len(m.big_idx)
        leaves = [None] * n_leaves
        small = _unflatten_small(
            m, moment["flat"],
            [jnp.zeros((), jnp.float32)] * n_leaves)
        for s, i in enumerate(m.small_idx):
            leaves[i] = small[s]
        for b, i in enumerate(m.big_idx):
            leaves[i] = moment["big"][b]
        return jax.tree_util.tree_unflatten(m.treedef, leaves)

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

    def _update_flat(self, grads, state, params, lr, wd):
        """AdamW with the small-leaf group fused into one padded flat buffer
        (see flat_small). Per-PARAM clip norms come from exact blocked
        segment sums over the padded layout (pad elements are zero), so the
        numerics match the per-tensor path up to f32 re-association."""
        m = self._meta
        b1, b2 = self.betas
        step = state.step + 1
        bc1 = 1 - b1 ** step.astype(jnp.float32)
        bc2 = 1 - b2 ** step.astype(jnp.float32)
        n_seg = len(m.small_idx)

        p_leaves = jax.tree_util.tree_leaves(params)
        g_leaves = jax.tree_util.tree_leaves(grads)
        nd = self.nd_mask or jax.tree.map(lambda _: False, params)
        scales = self.lr_scales or jax.tree.map(lambda _: 1.0, params)
        nd_leaves = jax.tree_util.tree_leaves(nd)
        sc_leaves = jax.tree_util.tree_leaves(scales)

        # ---- small group: flat blocked math
        gf = _flatten_small(m, g_leaves).reshape(-1, m.block)
        pf = _flatten_small(m, p_leaves).reshape(-1, m.block)
        muf = state.mu["flat"].reshape(-1, m.block)
        nuf = state.nu["flat"].reshape(-1, m.block)

        block_sq = (gf * gf).sum(axis=1)                     # (n_blocks,)
        seg_sq = jax.ops.segment_sum(block_sq, m.block_seg, num_segments=n_seg,
                                     indices_are_sorted=True)
        small_norms = jnp.sqrt(seg_sq)
        if self.clip_grad and self.clip_grad > 0:
            coef = self.clip_grad / (small_norms + 1e-6)
            coef = jnp.minimum(coef, 1.0)[m.block_seg][:, None]
            gf = gf * coef
        mu_new = b1 * muf + (1 - b1) * gf
        nu_new = b2 * nuf + (1 - b2) * gf * gf
        step_lr = lr * m.scale_block
        p_new = pf * (1 - step_lr * m.wd_block * wd) \
            - step_lr * (mu_new / bc1) / (jnp.sqrt(nu_new / bc2) + self.eps)
        # keep pad elements exactly zero (they enter the next step's flatten)
        p_new = p_new * m.pad_mask
        small_leaves = _unflatten_small(m, p_new.ravel(), p_leaves)

        # ---- big leaves: per-tensor, reference semantics
        big_out, big_mu, big_nu, big_sq = [], [], [], []
        for b, i in enumerate(m.big_idx):
            g = g_leaves[i]
            n = jnp.linalg.norm(g.reshape(-1))
            big_sq.append(n * n)
            if self.clip_grad and self.clip_grad > 0:
                c = self.clip_grad / (n + 1e-6)
                g = jnp.where(c < 1, g * c, g)
            mb = b1 * state.mu["big"][b] + (1 - b1) * g
            vb = b2 * state.nu["big"][b] + (1 - b2) * g * g
            this_wd = jnp.where(nd_leaves[i], 0.0, wd)
            s_lr = lr * sc_leaves[i]
            p = p_leaves[i] * (1 - s_lr * this_wd)
            big_out.append(p - s_lr * (mb / bc1) / (jnp.sqrt(vb / bc2) + self.eps))
            big_mu.append(mb)
            big_nu.append(vb)

        grad_norm = jnp.sqrt(seg_sq.sum() + sum(big_sq)) if big_sq \
            else jnp.sqrt(seg_sq.sum())
        n_leaves = len(p_leaves)
        out_leaves = [None] * n_leaves
        for s, i in enumerate(m.small_idx):
            out_leaves[i] = small_leaves[s]
        for b, i in enumerate(m.big_idx):
            out_leaves[i] = big_out[b]
        new_params = jax.tree_util.tree_unflatten(m.treedef, out_leaves)
        new_state = RefOptState(
            step, {"flat": mu_new.ravel(), "big": big_mu},
            {"flat": nu_new.ravel(), "big": big_nu})
        return new_params, new_state, grad_norm

    def update(self, grads, state, params, lr, wd):
        if self._meta is not None:
            return self._update_flat(grads, state, params, lr, wd)
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


def build_optimizer(hparams, params, is_pretrain: bool,
                    fused_flat: bool = False) -> RefOptimizer:
    """reference optimizer.py:14-18 on a flax param tree.

    hparams needs: optim_type, arch, layer_decay, clip_grad (others are
    threaded per-step: lr, weight_decay). ``fused_flat`` opts into the
    flat small-leaf AdamW group (callers enable it when params are
    replicated — a 'model'-sharded leaf cannot join a flat buffer).
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
        flat_small=fused_flat,
    )
