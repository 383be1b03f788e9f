"""Weight initializers matching the reference's PyTorch distributions.

The reference (transformer.py / weight_init.py / video_transformer.py) relies on
PyTorch defaults plus a few explicit rules:

- ``nn.Linear`` default: kaiming_uniform(a=sqrt(5)) on the weight, which reduces to
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
- ``trunc_normal_`` (weight_init.py:31-83): inverse-CDF truncated normal on [-2, 2].
- ``kaiming_init_`` (weight_init.py:91-103): kaiming normal, used with
  mode='fan_in', nonlinearity='relu' for the patch-embed conv (transformer.py:132-136).
- zero/constant init for ``temporal_fc`` (transformer.py:228-232) and biases.

These are reimplemented here as flax-style initializers so a from-scratch training
run starts from the same distribution family as the reference.
"""

import math

import jax
import jax.numpy as jnp


def torch_linear_kernel_init(fan_in=None):
    """PyTorch nn.Linear default weight init, for a flax (in, out) kernel."""

    def init(key, shape, dtype=jnp.float32):
        # flax Dense kernel shape is (in_features, out_features)
        _fan_in = fan_in if fan_in is not None else shape[0]
        bound = 1.0 / math.sqrt(_fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_linear_bias_init(fan_in):
    """PyTorch nn.Linear default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def trunc_normal_init(std=0.02, mean=0.0, a=-2.0, b=2.0):
    """Truncated normal via inverse CDF, identical to reference weight_init.py:31-62."""

    def init(key, shape, dtype=jnp.float32):
        def norm_cdf(x):
            return (1.0 + math.erf(x / math.sqrt(2.0))) / 2.0

        l = norm_cdf((a - mean) / std)
        u = norm_cdf((b - mean) / std)
        x = jax.random.uniform(
            key, shape, jnp.float32, minval=2 * l - 1, maxval=2 * u - 1
        )
        x = jax.scipy.special.erfinv(x)
        x = x * (std * math.sqrt(2.0)) + mean
        return jnp.clip(x, a, b).astype(dtype)

    return init


def kaiming_normal_fan_in_relu(kernel_layout="HWIO"):
    """kaiming_normal_(mode='fan_in', nonlinearity='relu') for conv kernels.

    For a flax conv kernel (spatial..., in, out): fan_in = in * prod(spatial),
    std = sqrt(2) / sqrt(fan_in). Matches reference transformer.py:132-136.
    """

    def init(key, shape, dtype=jnp.float32):
        receptive = 1
        for s in shape[:-2]:
            receptive *= s
        fan_in = shape[-2] * receptive
        std = math.sqrt(2.0) / math.sqrt(fan_in)
        return std * jax.random.normal(key, shape, dtype)

    return init


def xavier_uniform_flat():
    """xavier_uniform on the (out, flattened-in) view, as MaskFeat's patch embed does.

    Reference video_transformer.py:860-861: ``nn.init.xavier_uniform_(w.view([out, -1]))``
    i.e. fan_in = in*prod(kernel), fan_out = out.
    """

    def init(key, shape, dtype=jnp.float32):
        # flax conv kernel: (spatial..., in, out)
        receptive = 1
        for s in shape[:-2]:
            receptive *= s
        fan_in = shape[-2] * receptive
        fan_out = shape[-1]
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def normal_init(std=0.01):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


zeros_init = jax.nn.initializers.zeros
ones_init = jax.nn.initializers.ones
