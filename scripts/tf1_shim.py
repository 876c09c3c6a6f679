"""tf.compat.v1 + contrib shim: execute the TF1.14 reference under TF2.

The reference (/root/reference, SA-GNN) is TF 1.14 code; this image ships
TF 2.21 whose `tf.compat.v1` keeps the graph-mode core (placeholders,
Session, get_variable, segment_sum, sparse, AdamOptimizer) but has LOST
`tf.contrib` and the keras-backed `tf.layers` / `rnn_cell` shims. This
module reconstructs exactly the missing surface the reference touches
(grep-verified): contrib.rnn.{BasicLSTMCell,DropoutWrapper,MultiRNNCell},
contrib.layers.{layer_norm,xavier_initializer}, tf.layers.dense, and
nn.dynamic_rnn (re-implemented as a static unroll — identical semantics
for the fixed interval count).

`install()` replaces sys.modules['tensorflow'] so the reference's
`import tensorflow as tf` resolves here. Shimmed ops record their output
tensors in RECORDED for per-layer fixture capture.

Faithfulness notes (semantics from the public TF 1.14 sources/docs):
  - BasicLSTMCell: gates = [x, h] @ kernel + bias, kernel [D+H, 4H],
    gate order (i, j, f, o), forget_bias 1.0 added to f, zero-init bias.
  - contrib layer_norm defaults: begin_norm_axis=1 (moments over ALL
    non-batch axes), begin_params_axis=-1, center=scale=True,
    variance_epsilon=1e-12.
  - xavier_initializer(uniform=True) == glorot_uniform.
  - tf.layers.dense: auto-uniquified 'dense*' scope, kernel+bias,
    glorot_uniform kernel default, zero bias.
These two re-implemented pieces (LSTM cell, layer_norm) are the only parts
of the fixture whose math comes from this shim rather than from executing
original TF kernels; everything else (embedding lookups, segment_sum
propagation, exp attention, losses, Adam) runs genuine TF ops.
"""

from __future__ import annotations

import sys
import types

import tensorflow.compat.v1 as tf1

tf1.disable_v2_behavior()

RECORDED = []  # (label, tensor) — shimmed-layer outputs, fetchable


def record(label, tensor):
    RECORDED.append((label, tensor))
    return tensor


# ---------------------------------------------------------------------------
# tf.layers.dense
# ---------------------------------------------------------------------------

def dense(inputs, units, activation=None, use_bias=True,
          kernel_initializer=None, name=None, **_):
    with tf1.variable_scope(None, default_name=name or "dense") as vs:
        in_dim = int(inputs.shape[-1])
        kernel = tf1.get_variable(
            "kernel", [in_dim, units],
            initializer=kernel_initializer or
            tf1.glorot_uniform_initializer())
        out = tf1.tensordot(inputs, kernel, [[inputs.shape.ndims - 1], [0]])
        if use_bias:
            bias = tf1.get_variable("bias", [units],
                                    initializer=tf1.zeros_initializer())
            out = out + bias
    if activation is not None:
        out = activation(out)
    return record(vs.name, out)


# ---------------------------------------------------------------------------
# contrib.layers
# ---------------------------------------------------------------------------

def layer_norm(inputs, **_):
    """TF1.14 tf.contrib.layers.layer_norm with its defaults."""
    with tf1.variable_scope(None, default_name="LayerNorm") as vs:
        d = int(inputs.shape[-1])
        beta = tf1.get_variable("beta", [d],
                                initializer=tf1.zeros_initializer())
        gamma = tf1.get_variable("gamma", [d],
                                 initializer=tf1.ones_initializer())
    axes = list(range(1, inputs.shape.ndims))
    mean, var = tf1.nn.moments(inputs, axes, keep_dims=True)
    out = tf1.nn.batch_normalization(inputs, mean, var, beta, gamma, 1e-12)
    return record(vs.name, out)


def xavier_initializer(uniform=True, seed=None, dtype=None):
    assert uniform, "reference only uses the uniform variant"
    return tf1.glorot_uniform_initializer(seed=seed)


# ---------------------------------------------------------------------------
# contrib.rnn + nn.dynamic_rnn
# ---------------------------------------------------------------------------

class BasicLSTMCell:
    _count = 0

    def __init__(self, num_units, forget_bias=1.0):
        self.num_units = num_units
        self.forget_bias = forget_bias
        self._scope = f"shim_basic_lstm_cell_{BasicLSTMCell._count}"
        BasicLSTMCell._count += 1

    @property
    def state_size(self):
        return (self.num_units, self.num_units)

    @property
    def output_size(self):
        return self.num_units

    def zero_state(self, batch_size, dtype):
        z = tf1.zeros([batch_size, self.num_units], dtype)
        return (z, z)

    def __call__(self, inputs, state):
        c, h = state
        d = int(inputs.shape[-1])
        # AUTO_REUSE: the SAME cell object serves both dynamic_rnn calls
        # (user and item streams share weights — reference quirk Q4)
        with tf1.variable_scope(self._scope, reuse=tf1.AUTO_REUSE):
            kernel = tf1.get_variable(
                "kernel", [d + self.num_units, 4 * self.num_units],
                initializer=tf1.glorot_uniform_initializer())
            bias = tf1.get_variable(
                "bias", [4 * self.num_units],
                initializer=tf1.zeros_initializer())
        gates = tf1.matmul(tf1.concat([inputs, h], 1), kernel) + bias
        i, j, f, o = tf1.split(gates, 4, axis=1)
        new_c = (c * tf1.sigmoid(f + self.forget_bias)
                 + tf1.sigmoid(i) * tf1.tanh(j))
        new_h = tf1.sigmoid(o) * tf1.tanh(new_c)
        return new_h, (new_c, new_h)


class DropoutWrapper:
    def __init__(self, cell, output_keep_prob=1.0):
        self.cell = cell
        self.keep = output_keep_prob

    @property
    def state_size(self):
        return self.cell.state_size

    @property
    def output_size(self):
        return self.cell.output_size

    def zero_state(self, batch_size, dtype):
        return self.cell.zero_state(batch_size, dtype)

    def __call__(self, inputs, state):
        out, new_state = self.cell(inputs, state)
        out = tf1.nn.dropout(out, rate=1.0 - self.keep)
        return out, new_state


class MultiRNNCell:
    def __init__(self, cells, state_is_tuple=True):
        assert state_is_tuple
        self.cells = cells

    @property
    def output_size(self):
        return self.cells[-1].output_size

    def zero_state(self, batch_size, dtype):
        return tuple(c.zero_state(batch_size, dtype) for c in self.cells)

    def __call__(self, inputs, state):
        new_states = []
        out = inputs
        for cell, s in zip(self.cells, state):
            out, ns = cell(out, s)
            new_states.append(ns)
        return out, tuple(new_states)


def dynamic_rnn(cell, inputs, dtype=None, **_):
    """Static unroll with dynamic_rnn semantics (T is static here: the
    interval axis, graphNum <= 12)."""
    T = int(inputs.shape[1])
    batch = tf1.shape(inputs)[0]
    state = cell.zero_state(batch, dtype or inputs.dtype)
    outs = []
    for t in range(T):
        out, state = cell(inputs[:, t], state)
        outs.append(out)
    result = tf1.stack(outs, axis=1)
    return record(f"dynamic_rnn_{len(RECORDED)}", result), state


# ---------------------------------------------------------------------------
# module assembly
# ---------------------------------------------------------------------------

def install():
    """Register the shimmed 'tensorflow' in sys.modules (idempotent).

    Must run BEFORE any `import tensorflow` in reference code; the real
    TF2 stays importable as tensorflow.compat.v1 internals.
    """
    contrib_rnn = types.ModuleType("tensorflow.contrib.rnn")
    contrib_rnn.BasicLSTMCell = BasicLSTMCell
    contrib_rnn.DropoutWrapper = DropoutWrapper
    contrib_rnn.MultiRNNCell = MultiRNNCell

    contrib_layers = types.ModuleType("tensorflow.contrib.layers")
    contrib_layers.layer_norm = layer_norm
    contrib_layers.xavier_initializer = xavier_initializer

    contrib = types.ModuleType("tensorflow.contrib")
    contrib.rnn = contrib_rnn
    contrib.layers = contrib_layers

    layers_mod = types.ModuleType("tensorflow.layers")
    layers_mod.dense = dense

    nn_wrap = types.ModuleType("tensorflow.nn")

    def _nn_getattr(name):
        if name == "dynamic_rnn":
            return dynamic_rnn
        return getattr(tf1.nn, name)

    nn_wrap.__getattr__ = _nn_getattr

    shim = types.ModuleType("tensorflow")
    shim.contrib = contrib
    shim.layers = layers_mod
    shim.nn = nn_wrap

    def _getattr(name):
        if name == "to_float":
            return lambda x: tf1.cast(x, tf1.float32)
        return getattr(tf1, name)

    shim.__getattr__ = _getattr

    for mod_name, mod in [
        ("tensorflow", shim),
        ("tensorflow.contrib", contrib),
        ("tensorflow.contrib.rnn", contrib_rnn),
        ("tensorflow.contrib.layers", contrib_layers),
        ("tensorflow.layers", layers_mod),
        ("tensorflow.nn", nn_wrap),
    ]:
        sys.modules[mod_name] = mod
    return shim
