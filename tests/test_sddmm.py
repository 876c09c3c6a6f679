"""Weighted SpMM + SDDMM kernel tests (interpreter mode on CPU).

These ops back the non-parity normalized/edge-scored propagation variants
(the reference computes sym-sqrt normalization then destroys it —
DataHandler.py:50-59, SURVEY.md Q2 — so the parity path never needs them).
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from sagnn_tpu.data.graph import (
    compile_interval_graphs, direction_permutation, edge_weights,
)
from sagnn_tpu.ops.segment import gather_segment_sum
from sagnn_tpu.ops.spmm_pallas import (
    R, build_stacked_plans, plan_spmm, sddmm_from_plans,
    spmm_weighted_from_plans,
)


def _random_bipartite(rng, U, I, E):
    """Target-sorted (by user) COO + the transpose, with canonical ids."""
    tgt = np.sort(rng.integers(0, U, E, dtype=np.int32))
    src = rng.integers(0, I, E, dtype=np.int32)
    # transpose direction: aggregate by item; canonical order = fwd order
    order = np.argsort(src, kind="stable")
    t_src, t_tgt, t_ids = tgt[order], src[order], order.astype(np.int32)
    return src, tgt, t_src, t_tgt, t_ids


def test_plan_edge_tracking_roundtrip():
    rng = np.random.default_rng(0)
    U, I, E = 300, 250, 2000
    src, tgt, *_ = _random_bipartite(rng, U, I, E)
    p = plan_spmm(src, tgt, U, track_edges=True)
    assert p.num_edge_ids == E
    # every canonical id appears exactly once among real slots
    real = p.edge_slot[p.edge_slot < E]
    assert len(real) == E and len(np.unique(real)) == E
    # edge_pos inverts edge_slot
    assert (p.edge_slot[p.edge_pos] == np.arange(E)).all()
    # the slot's (src, tgt) matches the original edge
    flat_tl = p.tgt_local.reshape(-1)
    blk = np.repeat(p.chunk_block, p.tgt_local.shape[-1])
    for e in rng.integers(0, E, 50):
        s = p.edge_pos[e]
        assert p.src[s] == src[e]
        assert blk[s] * R + flat_tl[s] == tgt[e]


def test_sddmm_matches_numpy():
    rng = np.random.default_rng(1)
    U, I, D, E = 500, 350, 64, 6000
    src, tgt, t_src, t_tgt, t_ids = _random_bipartite(rng, U, I, E)
    X = rng.standard_normal((I, D)).astype(np.float32)  # source table
    Y = rng.standard_normal((U, D)).astype(np.float32)  # target table
    fwd = plan_spmm(src, tgt, U, track_edges=True)
    bwd = plan_spmm(t_src, t_tgt, I, edge_ids=t_ids)
    s = sddmm_from_plans(jnp.asarray(X), jnp.asarray(Y), fwd, bwd)
    expect = np.einsum("ed,ed->e", X[src], Y[tgt])
    np.testing.assert_allclose(np.asarray(s), expect, rtol=1e-5, atol=1e-4)


def test_spmm_weighted_matches_xla():
    rng = np.random.default_rng(2)
    U, I, D, E = 400, 300, 32, 5000
    src, tgt, t_src, t_tgt, t_ids = _random_bipartite(rng, U, I, E)
    X = rng.standard_normal((I, D)).astype(np.float32)
    w = rng.standard_normal(E).astype(np.float32)
    fwd = plan_spmm(src, tgt, U, track_edges=True)
    bwd = plan_spmm(t_src, t_tgt, I, edge_ids=t_ids)
    out = spmm_weighted_from_plans(jnp.asarray(X), jnp.asarray(w), fwd, bwd)
    expect = gather_segment_sum(jnp.asarray(X), jnp.asarray(src),
                                jnp.asarray(tgt), U, weights=jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-5, atol=1e-4)


def test_spmm_weighted_grads():
    """dx AND dw against the XLA segment-sum reference."""
    rng = np.random.default_rng(3)
    U, I, D, E = 260, 180, 16, 1500
    src, tgt, t_src, t_tgt, t_ids = _random_bipartite(rng, U, I, E)
    X = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(E).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((U, D)).astype(np.float32))
    fwd = plan_spmm(src, tgt, U, track_edges=True)
    bwd = plan_spmm(t_src, t_tgt, I, edge_ids=t_ids)

    def f_pallas(x, ww):
        return jnp.vdot(spmm_weighted_from_plans(x, ww, fwd, bwd), cot)

    def f_ref(x, ww):
        out = gather_segment_sum(x, jnp.asarray(src), jnp.asarray(tgt), U,
                                 weights=ww)
        return jnp.vdot(out, cot)

    gx, gw = jax.grad(f_pallas, argnums=(0, 1))(X, w)
    rx, rw = jax.grad(f_ref, argnums=(0, 1))(X, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-5, atol=1e-4)


def test_sddmm_grads():
    rng = np.random.default_rng(4)
    U, I, D, E = 260, 180, 16, 1500
    src, tgt, t_src, t_tgt, t_ids = _random_bipartite(rng, U, I, E)
    X = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))
    Y = jnp.asarray(rng.standard_normal((U, D)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal(E).astype(np.float32))
    fwd = plan_spmm(src, tgt, U, track_edges=True)
    bwd = plan_spmm(t_src, t_tgt, I, edge_ids=t_ids)

    def f_pallas(x, y):
        return jnp.vdot(sddmm_from_plans(x, y, fwd, bwd), cot)

    def f_ref(x, y):
        s = jnp.sum(jnp.take(x, jnp.asarray(src), axis=0)
                    * jnp.take(y, jnp.asarray(tgt), axis=0), axis=-1)
        return jnp.vdot(s, cot)

    gx, gy = jax.grad(f_pallas, argnums=(0, 1))(X, Y)
    rx, ry = jax.grad(f_ref, argnums=(0, 1))(X, Y)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(ry),
                               rtol=1e-5, atol=1e-4)


def _interval_mats(rng, U, I, g, nnz):
    mats = []
    for _ in range(g):
        rows = rng.integers(0, U, nnz)
        cols = rng.integers(0, I, nnz)
        m = sp.csr_matrix((np.ones(nnz), (rows, cols)), shape=(U, I))
        m.sum_duplicates()
        mats.append(m)
    return mats


def test_direction_permutation():
    rng = np.random.default_rng(5)
    U, I = 120, 90
    mats = _interval_mats(rng, U, I, g=3, nnz=800)
    gb = compile_interval_graphs(mats, pad_multiple=128)
    perm = direction_permutation(gb, mats)
    for k in range(gb.graph_num):
        n = int(gb.edge_counts[k])
        # the i-direction edge j is the same (user, item) pair as the
        # u-direction edge perm[k, j]
        u_pairs = np.stack([gb.u_tgt[k, :n], gb.u_src[k, :n]], 1)
        i_pairs = np.stack([gb.i_src[k, :n], gb.i_tgt[k, :n]], 1)
        assert (u_pairs[perm[k, :n]] == i_pairs).all()
        assert len(np.unique(perm[k, :n])) == n


def test_weighted_stacked_plans_match_xla_propagation():
    """sym-sqrt-normalized propagation: pallas weighted pipeline vs XLA."""
    rng = np.random.default_rng(6)
    U, I, D = 200, 160, 32
    mats = _interval_mats(rng, U, I, g=2, nnz=600)
    gb = compile_interval_graphs(mats, pad_multiple=128)
    ew = edge_weights(gb, mats)                       # [2, g, E]
    perm = direction_permutation(gb, mats)
    plans = build_stacked_plans(gb.u_src, gb.u_tgt, gb.i_src, gb.i_tgt,
                                U, I, gb.edge_counts, track_edges=True,
                                i_edge_ids=perm)
    X_items = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))
    for k in range(gb.graph_num):
        fwd = {key: plans["u"][key][k] for key in plans["u"]}
        bwd = {key: plans["i"][key][k] for key in plans["i"]}
        fa = tuple(jnp.asarray(fwd[key]) for key in
                   ("src", "tgt_local", "chunk_block", "chunk_first",
                    "edge_slot", "edge_pos"))
        ba = tuple(jnp.asarray(bwd[key]) for key in
                   ("src", "tgt_local", "chunk_block", "chunk_first",
                    "edge_slot", "edge_pos"))
        from sagnn_tpu.ops.spmm_pallas import spmm_weighted
        w = jnp.asarray(ew[0, k])                     # canonical = u order
        out = spmm_weighted(X_items, w, fa, ba,
                            plans["num_blocks_u"], U,
                            plans["num_blocks_i"], I, True)
        expect = gather_segment_sum(
            X_items, jnp.asarray(gb.u_src[k]), jnp.asarray(gb.u_tgt[k]), U,
            weights=w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   rtol=1e-5, atol=1e-4)


def test_attention_propagate_matches_numpy():
    from sagnn_tpu.ops.edge_attention import attention_propagate, edge_softmax
    from sagnn_tpu.ops.spmm_pallas import _plan_args_tracked

    rng = np.random.default_rng(7)
    U, I, D, E = 300, 220, 16, 2500
    src, tgt, t_src, t_tgt, t_ids = _random_bipartite(rng, U, I, E)
    X = rng.standard_normal((I, D)).astype(np.float32)   # sources
    Y = rng.standard_normal((U, D)).astype(np.float32)   # targets
    fwd = plan_spmm(src, tgt, U, track_edges=True)
    bwd = plan_spmm(t_src, t_tgt, I, edge_ids=t_ids)
    fa, fnb, fnt = _plan_args_tracked(fwd)
    ba, bnb, bnt = _plan_args_tracked(bwd)

    out = attention_propagate(jnp.asarray(X), jnp.asarray(Y),
                              jnp.asarray(tgt), fa, ba, fnb, fnt, bnb, bnt)

    # numpy reference
    s = np.einsum("ed,ed->e", X[src], Y[tgt]) / np.sqrt(D)
    w = np.zeros(E)
    for t in np.unique(tgt):
        sel = tgt == t
        e = np.exp(s[sel] - s[sel].max())
        w[sel] = e / e.sum()
    expect = np.zeros((U, D), np.float32)
    np.add.at(expect, tgt, w[:, None] * X[src])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)


def test_attention_propagate_grads_finite_and_match():
    from sagnn_tpu.ops.edge_attention import attention_propagate
    from sagnn_tpu.ops.spmm_pallas import _plan_args_tracked
    from sagnn_tpu.ops.segment import gather_segment_sum

    rng = np.random.default_rng(8)
    U, I, D, E = 200, 150, 8, 1200
    src, tgt, t_src, t_tgt, t_ids = _random_bipartite(rng, U, I, E)
    X = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))
    Y = jnp.asarray(rng.standard_normal((U, D)).astype(np.float32))
    fwd = plan_spmm(src, tgt, U, track_edges=True)
    bwd = plan_spmm(t_src, t_tgt, I, edge_ids=t_ids)
    fa, fnb, fnt = _plan_args_tracked(fwd)
    ba, bnb, bnt = _plan_args_tracked(bwd)
    tgt_d = jnp.asarray(tgt)

    def f_pallas(x, y):
        out = attention_propagate(x, y, tgt_d, fa, ba, fnb, fnt, bnb, bnt)
        return jnp.sum(out ** 2)

    def f_ref(x, y):
        s = jnp.sum(jnp.take(x, jnp.asarray(src), axis=0)
                    * jnp.take(y, tgt_d, axis=0), -1) / jnp.sqrt(float(D))
        m = jax.ops.segment_max(s, tgt_d, num_segments=U,
                                indices_are_sorted=True)
        z = jnp.exp(s - jnp.take(m, tgt_d))
        den = jax.ops.segment_sum(z, tgt_d, num_segments=U,
                                  indices_are_sorted=True)
        w = z / jnp.take(den, tgt_d)
        out = gather_segment_sum(x, jnp.asarray(src), tgt_d, U, weights=w)
        return jnp.sum(out ** 2)

    gx, gy = jax.grad(f_pallas, argnums=(0, 1))(X, Y)
    rx, ry = jax.grad(f_ref, argnums=(0, 1))(X, Y)
    assert np.isfinite(np.asarray(gx)).all()
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(ry),
                               rtol=1e-4, atol=1e-4)
