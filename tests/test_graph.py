"""Graph compilation tests (sagnn_tpu/data/graph.py)."""

import numpy as np
import scipy.sparse as sp

from sagnn_tpu.data.graph import (
    build_user_item_csr, compile_interval_graphs, direction_permutation,
    edge_weights, edge_weights_canonical,
)


def _rand_mats(rng, g=3, U=17, I=23, density=0.1):
    mats = []
    for _ in range(g):
        m = sp.random(U, I, density=density, random_state=rng,
                      data_rvs=lambda n: np.ones(n))
        mats.append(sp.csr_matrix(m))
    return mats


def test_padded_blocks_match_scipy():
    rng = np.random.RandomState(0)
    mats = _rand_mats(rng)
    g = compile_interval_graphs(mats, pad_multiple=8)
    U, I = mats[0].shape
    for k, m in enumerate(mats):
        n = m.nnz
        assert g.edge_counts[k] == n
        # user direction: tgt=row, src=col
        coo = sp.coo_matrix(m)
        real_t = g.u_tgt[k][:n]
        real_s = g.u_src[k][:n]
        got = sp.coo_matrix((np.ones(n), (real_t, real_s)), shape=(U, I))
        assert (got != coo).nnz == 0
        # padding entries point at the dump row
        assert (g.u_tgt[k][n:] == U).all()
        assert (g.u_src[k][n:] == 0).all()
        # sortedness (Q9)
        assert (np.diff(g.u_tgt[k]) >= 0).all()
        assert (np.diff(g.i_tgt[k]) >= 0).all()
        # item direction is the transpose graph
        got_t = sp.coo_matrix(
            (np.ones(n), (g.i_tgt[k][:n], g.i_src[k][:n])), shape=(I, U))
        assert (got_t != coo.T.tocsr()).nnz == 0


def test_empty_interval():
    U, I = 5, 7
    mats = [sp.csr_matrix((U, I)), sp.csr_matrix(
        (np.ones(2), ([1, 3], [2, 4])), shape=(U, I))]
    g = compile_interval_graphs(mats, pad_multiple=4)
    assert g.edge_counts[0] == 0
    assert (g.u_tgt[0] == U).all()
    assert (g.i_tgt[0] == I).all()


def test_common_padded_size():
    rng = np.random.RandomState(1)
    mats = _rand_mats(rng, g=4, density=0.05)
    g = compile_interval_graphs(mats, pad_multiple=16)
    assert g.u_src.shape == g.u_tgt.shape == g.i_src.shape == g.i_tgt.shape
    assert g.edges_padded % 16 == 0
    assert g.edges_padded >= g.edge_counts.max()


def test_edge_weights_sym_sqrt():
    rng = np.random.RandomState(2)
    mats = _rand_mats(rng, g=2)
    g = compile_interval_graphs(mats, pad_multiple=8)
    w = edge_weights(g, mats)
    k = 0
    m = sp.coo_matrix(mats[k])
    row_deg = np.asarray((mats[k] != 0).sum(axis=1)).ravel()
    col_deg = np.asarray((mats[k] != 0).sum(axis=0)).ravel()
    n = m.nnz
    # check one direction's weights against direct computation
    for e in range(n):
        t, s = g.u_tgt[k][e], g.u_src[k][e]
        expect = (1 / (np.sqrt(row_deg[t] + 1e-8) + 1e-8)) * \
                 (1 / (np.sqrt(col_deg[s] + 1e-8) + 1e-8))
        assert np.isclose(w[0, k, e], expect, rtol=1e-5)
    assert (w[0, k, n:] == 0).all()


def test_edge_weights_mean():
    """'mean' norm: w = 1/target_deg per direction (GraphSAGE-mean)."""
    rng = np.random.RandomState(5)
    mats = _rand_mats(rng, g=2)
    g = compile_interval_graphs(mats, pad_multiple=8)
    w = edge_weights(g, mats, norm="mean")
    for k in range(2):
        n = int(g.edge_counts[k])
        row_deg = np.asarray((mats[k] != 0).sum(axis=1)).ravel()
        col_deg = np.asarray((mats[k] != 0).sum(axis=0)).ravel()
        np.testing.assert_allclose(
            w[0, k, :n], 1.0 / row_deg[g.u_tgt[k, :n]], rtol=1e-6)
        np.testing.assert_allclose(
            w[1, k, :n], 1.0 / col_deg[g.i_tgt[k, :n]], rtol=1e-6)
        assert (w[:, k, n:] == 0).all()


def test_edge_weights_canonical():
    """Canonicalization files each i-direction weight under its u-direction
    slot; symmetric norms collapse to two equal rows."""
    rng = np.random.RandomState(6)
    mats = _rand_mats(rng, g=2)
    g = compile_interval_graphs(mats, pad_multiple=8)
    perm = direction_permutation(g, mats)

    w = edge_weights(g, mats, norm="mean")
    canon = edge_weights_canonical(w, perm)
    np.testing.assert_array_equal(canon[0], w[0])
    for k in range(2):
        n = int(g.edge_counts[k])
        # the canonical slot of i-direction edge j carries its weight
        np.testing.assert_allclose(canon[1, k, perm[k, :n]], w[1, k, :n])
        # every canonical edge slot e is the SAME (user, item) pair in both
        # layouts, so canon[1][e] must equal 1/item_deg of edge e's item
        col_deg = np.asarray((mats[k] != 0).sum(axis=0)).ravel()
        np.testing.assert_allclose(
            canon[1, k, :n], 1.0 / col_deg[g.u_src[k, :n]], rtol=1e-6)

    ws = edge_weights(g, mats, norm="sym_sqrt")
    canon_s = edge_weights_canonical(ws, perm)
    np.testing.assert_allclose(canon_s[1], canon_s[0], rtol=1e-6)


def test_build_user_item_csr():
    seqs = [[0, 2], [1], []]
    m = build_user_item_csr(seqs, 3, 4)
    dense = m.toarray()
    expect = np.zeros((3, 4))
    expect[0, 0] = expect[0, 2] = expect[1, 1] = 1
    assert (dense == expect).all()
    # duplicates sum (reference csr_matrix semantics)
    m2 = build_user_item_csr([[1, 1]], 1, 3)
    assert m2[0, 1] == 2
