"""Kernel-level tests: propagation, attention, LSTM, layer norm vs the
NumPy oracle / scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from sagnn_tpu.data.graph import compile_interval_graphs
from sagnn_tpu.ops.attention import (
    init_mhsa_params, layer_norm, multi_head_self_attention,
)
from sagnn_tpu.ops.lstm import init_lstm_params, lstm_scan
from sagnn_tpu.ops.segment import gather_segment_sum, propagate

from tests import reference_oracle as oracle


def test_gather_segment_sum_vs_scipy():
    rng = np.random.RandomState(0)
    U, I, D = 13, 19, 8
    m = sp.csr_matrix(sp.random(U, I, density=0.2, random_state=rng,
                                data_rvs=lambda n: np.ones(n)))
    g = compile_interval_graphs([m], pad_multiple=8)
    x = rng.randn(I, D).astype(np.float32)
    got = gather_segment_sum(jnp.asarray(x), jnp.asarray(g.u_src[0]),
                             jnp.asarray(g.u_tgt[0]), U)
    expect = (m != 0).astype(np.float32) @ x
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5, atol=1e-5)


def test_propagate_matches_oracle():
    rng = np.random.RandomState(1)
    U, I, D = 11, 9, 4
    m = sp.csr_matrix(sp.random(U, I, density=0.3, random_state=rng,
                                data_rvs=lambda n: np.ones(n)))
    g = compile_interval_graphs([m], pad_multiple=8)
    x = rng.randn(I, D).astype(np.float32)
    got = propagate(jnp.asarray(x), jnp.asarray(g.u_src[0]),
                    jnp.asarray(g.u_tgt[0]), U, leaky=0.5)
    expect = oracle.propagate_dense(m.toarray(), x.astype(np.float64), 0.5)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5, atol=1e-5)


def test_weighted_segment_sum():
    rng = np.random.RandomState(2)
    U, I, D = 7, 8, 4
    m = sp.csr_matrix(sp.random(U, I, density=0.4, random_state=rng,
                                data_rvs=lambda n: np.ones(n)))
    g = compile_interval_graphs([m], pad_multiple=8)
    x = rng.randn(I, D).astype(np.float32)
    w = rng.rand(g.edges_padded).astype(np.float32)
    w[g.edge_counts[0]:] = 0
    got = gather_segment_sum(jnp.asarray(x), jnp.asarray(g.u_src[0]),
                             jnp.asarray(g.u_tgt[0]), U, jnp.asarray(w))
    expect = np.zeros((U, D), np.float32)
    for e in range(g.edge_counts[0]):
        expect[g.u_tgt[0][e]] += w[e] * x[g.u_src[0][e]]
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4, atol=1e-5)


def test_mhsa_matches_oracle():
    rng = np.random.RandomState(3)
    B, T, D, H = 5, 6, 16, 4
    p = init_mhsa_params(jax.random.PRNGKey(0), D)
    p = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32) * 0.3), p)
    x = rng.randn(B, T, D).astype(np.float32)
    got = multi_head_self_attention(p, jnp.asarray(x), H)
    p_np = jax.tree_util.tree_map(np.asarray, p)
    expect = oracle.mhsa(p_np, x.astype(np.float64), H)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4, atol=1e-5)


def test_mhsa_stable_matches_unstable_when_safe():
    rng = np.random.RandomState(4)
    B, T, D, H = 2, 4, 8, 2
    p = init_mhsa_params(jax.random.PRNGKey(1), D)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    raw = multi_head_self_attention(p, x, H, stable=False)
    stable = multi_head_self_attention(p, x, H, stable=True)
    np.testing.assert_allclose(np.asarray(raw), np.asarray(stable),
                               rtol=1e-4, atol=1e-5)


def test_lstm_matches_oracle():
    rng = np.random.RandomState(5)
    N, T, D = 7, 5, 12
    p = init_lstm_params(jax.random.PRNGKey(2), D)
    x = rng.randn(N, T, D).astype(np.float32)
    got = lstm_scan(p, jnp.asarray(x))
    expect = oracle.lstm(np.asarray(p["kernel"]), np.asarray(p["bias"]),
                         x.astype(np.float64))
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4, atol=1e-5)


def test_lstm_dropout_scaling():
    rng = np.random.RandomState(6)
    N, T, D = 64, 4, 8
    p = init_lstm_params(jax.random.PRNGKey(3), D)
    x = jnp.asarray(rng.randn(N, T, D).astype(np.float32))
    out = lstm_scan(p, x, keep_rate=0.5, dropout_key=jax.random.PRNGKey(7))
    base = lstm_scan(p, x)
    zeros = np.asarray(out) == 0
    assert 0.3 < zeros.mean() < 0.7  # ~half dropped
    nz = ~zeros
    np.testing.assert_allclose(np.asarray(out)[nz],
                               (np.asarray(base) / 0.5)[nz], rtol=1e-5)


def test_layer_norm_tf_contrib_semantics():
    rng = np.random.RandomState(7)
    x = rng.randn(4, 3, 8).astype(np.float32) * 2 + 1
    scale = rng.randn(8).astype(np.float32)
    shift = rng.randn(8).astype(np.float32)
    got = layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(shift))
    expect = oracle.layer_norm(x.astype(np.float64), scale, shift)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4, atol=1e-5)
    # stats must be over (T, D) jointly, not per-position
    centered = (np.asarray(got) - shift) / np.where(scale == 0, 1, scale)
    assert abs(centered.reshape(4, -1).mean(axis=1)).max() < 1e-3
