"""Torch-default initializers, so training dynamics match the reference.

torch defaults replicated:
- nn.Linear:  weight kaiming_uniform(a=√5) == U(-1/√fan_in, 1/√fan_in);
              bias U(-1/√fan_in, 1/√fan_in)
- nn.MultiheadAttention: in-proj weights xavier_uniform, biases zero,
              out_proj bias zero (torch ``_reset_parameters``)
- nn.Conv2d:  kaiming_uniform(a=√5) with fan_in = C_in·k·k
- nn.Embedding: N(0, 1)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def torch_linear_weight(key, shape, dtype=jnp.float32):
    """shape = (out_features, in_features) — torch layout."""
    fan_in = shape[-1]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_bias(fan_in):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_conv_weight(key, shape, dtype=jnp.float32):
    """shape = (C_out, C_in, kh, kw) — torch layout."""
    fan_in = shape[1] * shape[2] * shape[3]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_out, fan_in = shape[0], shape[1]
    bound = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def normal(stddev=1.0):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * stddev

    return init


def trunc_normal(stddev=1.0, mean=0.0):
    """torch nn.init.trunc_normal_: truncated to [-2, 2] std units."""

    def init(key, shape, dtype=jnp.float32):
        return mean + stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init
