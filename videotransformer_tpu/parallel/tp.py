"""Tensor-parallel parameter shardings over the mesh 'model' axis.

The reference has no model parallelism (SURVEY §2.2); this is the TPU-native
extension that makes the framework scale past data parallelism. Megatron-style
column/row sharding for every transformer block:

- qkv / fc1 kernels: column-parallel  -> P(None, 'model'), bias P('model')
- proj / fc2 kernels: row-parallel    -> P('model', None), bias replicated
  (XLA inserts the all-reduce over 'model' after the row-parallel matmul)
- everything else (norms, embeddings, convs, heads): replicated

We only annotate the PARAMETERS; jit's SPMD propagation pushes the shardings
through the attention-head reshapes (head count must divide the model-axis
size: 12 heads -> model in {1, 2, 3, 4, 6, 12}).
"""

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


COLUMN_KERNELS = ("qkv", "layers_0", "mlp_fc1")
ROW_KERNELS = ("proj", "layers_1", "mlp_fc2")


def tp_spec(path_parts, leaf) -> P:
    """PartitionSpec for one param leaf given its tree path."""
    if len(path_parts) >= 2:
        module, name = path_parts[-2], path_parts[-1]
        # attention out-projection is named 'proj' inside 'attn'; the MViT
        # residual projection ('proj' directly under a block) stays replicated
        in_attn_or_ffn = any(
            p.startswith(("attentions", "ffns", "attn", "blocks", "mlp"))
            for p in path_parts[:-1]
        )
        if module in COLUMN_KERNELS and in_attn_or_ffn:
            if name == "kernel":
                return P(None, "model")
            if name == "bias":
                return P("model")
        if module in ROW_KERNELS and in_attn_or_ffn and module != "proj":
            if name == "kernel":
                return P("model", None)
        if module == "proj" and in_attn_or_ffn and "attn" in path_parts:
            if name == "kernel":
                return P("model", None)
    return P()


def shard_params_tp(mesh: Mesh, params):
    """device_put a param tree with tensor-parallel shardings."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        parts = tuple(str(getattr(k, "key", k)) for k in path)
        spec = tp_spec(parts, leaf)
        # sanity: only apply if divisible
        ok = True
        for dim, axis in enumerate(spec):
            if axis == "model" and leaf.shape[dim] % mesh.shape["model"] != 0:
                ok = False
        sharding = NamedSharding(mesh, spec if ok else P())
        out.append(jax.device_put(leaf, sharding))
    return jax.tree_util.tree_unflatten(treedef, out)
