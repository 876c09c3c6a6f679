"""Parameter initialization helpers.

Replaces the reference's global mutable param registry (Utils/NNLayers.py:5-78)
with explicit pytrees. Initializers match TF1:
  * glorot/xavier uniform with TF's fan computation (`_compute_fans`): for an
    N-D shape, receptive_field = prod(shape[:-2]), fan_in = shape[-2]*rf,
    fan_out = shape[-1]*rf. This matters for the [g, U, D] embedding tables
    (NNLayers.py:47-50 uses xavier_initializer for every defineParam).
  * zeros for biases (NNLayers.py FC/Bias defaults).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def tf_glorot_uniform(key: jax.Array, shape: Sequence[int],
                      dtype=jnp.float32) -> jax.Array:
    shape = tuple(shape)
    if len(shape) < 1:
        fan_in = fan_out = 1
    elif len(shape) == 1:
        fan_in = fan_out = shape[0]
    else:
        rf = math.prod(shape[:-2]) if len(shape) > 2 else 1
        fan_in = shape[-2] * rf
        fan_out = shape[-1] * rf
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def leaky_relu(x: jax.Array, slope: float) -> jax.Array:
    """NNLayers.py:136: maximum(leaky*data, data)."""
    return jnp.maximum(slope * x, x)


def activate(x: jax.Array, method: str, leaky: float = 0.1) -> jax.Array:
    """Activation zoo matching NNLayers.ActivateHelp (126-148)."""
    if method == "relu":
        return jax.nn.relu(x)
    if method == "sigmoid":
        return jax.nn.sigmoid(x)
    if method == "tanh":
        return jnp.tanh(x)
    if method == "softmax":
        return jax.nn.softmax(x, axis=-1)
    if method == "leakyRelu":
        return leaky_relu(x, leaky)
    if method == "-1relu":
        return jnp.maximum(-1.0, x)
    if method == "relu6":
        return jnp.clip(x, 0.0, 6.0)
    if method == "relu3":
        return jnp.clip(x, 0.0, 3.0)
    raise ValueError(f"Error Activation Function: {method}")


def l2_sum(tree) -> jax.Array:
    """Σ ||p||² over a pytree (NNLayers.Regularize method='L2', 168-174)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(jnp.square(p)) for p in leaves)
