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


def batch_norm(x: jax.Array, scale: jax.Array, shift: jax.Array,
               ema_mean: jax.Array, ema_var: jax.Array, train: bool,
               decay: float = 0.5, eps: float = 1e-8):
    """Batch normalization matching NNLayers.BN (80-96): batch moments over
    axis 0 with an EMA (decay 0.5). DEAD in the reference's live path (FC is
    never called with useBN=True) — provided for layer-library completeness.
    Returns (y, new_ema_mean, new_ema_var)."""
    if train:
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
        new_mean = decay * ema_mean + (1 - decay) * mean
        new_var = decay * ema_var + (1 - decay) * var
    else:
        mean, var = ema_mean, ema_var
        new_mean, new_var = ema_mean, ema_var
    y = (x - mean) * jax.lax.rsqrt(var + eps) * scale + shift
    return y, new_mean, new_var


def dropout(key: jax.Array, x: jax.Array, rate: float) -> jax.Array:
    """Inverted dropout matching tf.nn.dropout (NNLayers.Dropout, 177-181)."""
    if rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def fc(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
       activation: str | None = None, leaky: float = 0.1) -> jax.Array:
    """Dense layer matching NNLayers.FC (98-115): matmul + optional bias +
    activation."""
    y = x @ w
    if b is not None:
        y = y + b
    if activation is not None:
        y = activate(y, activation, leaky)
    return y


def l2_sum(tree) -> jax.Array:
    """Σ ||p||² over a pytree (NNLayers.Regularize method='L2', 168-174)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(jnp.square(p)) for p in leaves)
