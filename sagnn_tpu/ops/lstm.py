"""LSTM over the interval axis, matching TF1 BasicLSTMCell semantics.

Reference (model.py:135-146): a single-layer `BasicLSTMCell(latdim)` wrapped
in `DropoutWrapper(output_keep_prob=keepRate)`, run via `dynamic_rnn` over the
graph_num axis. The SAME cell objects process users and items, so weights are
shared between the two streams (SURVEY.md Q4).

BasicLSTMCell (TF 1.14) semantics:
    gates = [x, h] @ kernel + bias            kernel: [D+H, 4H], bias: zeros
    i, j, f, o = split(gates, 4)              (input, cell, forget, output)
    c' = c * sigmoid(f + forget_bias) + sigmoid(i) * tanh(j)   forget_bias=1
    h' = sigmoid(o) * tanh(c')
Kernel initializer: glorot_uniform (TF1 dense default).

DropoutWrapper applies dropout to the OUTPUT h of each timestep with a fresh
mask per timestep (TF default, variational_recurrent=False), scaled by
1/keep_prob, only during training.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from sagnn_tpu.ops.attention import xavier_uniform


def init_lstm_params(key: jax.Array, d: int, hidden: Optional[int] = None
                     ) -> Dict[str, jax.Array]:
    h = hidden or d
    return {
        "kernel": xavier_uniform(key, (d + h, 4 * h)),
        "bias": jnp.zeros((4 * h,)),
    }


def lstm_scan(params: Dict[str, jax.Array], x: jax.Array,
              forget_bias: float = 1.0,
              keep_rate: float = 1.0,
              dropout_key: Optional[jax.Array] = None) -> jax.Array:
    """x: [N, T, D] -> outputs [N, T, H] (all h_t, like dynamic_rnn).

    When `dropout_key` is given and keep_rate < 1, per-timestep output
    dropout is applied (DropoutWrapper semantics).
    """
    N, T, D = x.shape
    H = params["kernel"].shape[1] // 4
    kernel = params["kernel"]
    bias = params["bias"]
    # split the concat([x,h]) @ kernel into two matmuls: avoids the
    # per-step [N, D+H] concat relayout, and the x-side matmuls for ALL
    # timesteps batch into one big MXU call below
    w_x, w_h = kernel[:D], kernel[D:]
    x_gates = x.reshape(N * T, D) @ w_x + bias      # [N*T, 4H], one matmul
    x_gates = x_gates.reshape(N, T, 4 * H)

    def step(carry, xg_t):
        c, h = carry
        gates = xg_t + h @ w_h
        i, j, f, o = jnp.split(gates, 4, axis=-1)
        c_new = c * jax.nn.sigmoid(f + forget_bias) + \
            jax.nn.sigmoid(i) * jnp.tanh(j)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return (c_new, h_new), h_new

    init = (jnp.zeros((N, H), x.dtype), jnp.zeros((N, H), x.dtype))
    xs = jnp.swapaxes(x_gates, 0, 1)  # [T, N, 4H] for scan over time
    # interval counts are tiny (T = graph_num ≤ 12): full unroll removes
    # scan overhead without code-size risk
    _, hs = jax.lax.scan(step, init, xs, unroll=True)
    out = jnp.swapaxes(hs, 0, 1)  # [N, T, H]

    if dropout_key is not None and keep_rate < 1.0:
        mask = jax.random.bernoulli(dropout_key, keep_rate, out.shape)
        out = jnp.where(mask, out / keep_rate, 0.0)
    return out
