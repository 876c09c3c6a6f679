"""Pallas SpMM kernel tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from sagnn_tpu.config import ModelConfig
from sagnn_tpu.data.graph import compile_interval_graphs
from sagnn_tpu.data.synthetic import synthetic_dataset
from sagnn_tpu.models.selfgnn import SelfGNN
from sagnn_tpu.ops.spmm_pallas import (
    C, R, SpmmPlan, build_stacked_plans, plan_spmm, spmm_apply,
    spmm_from_plans, _plan_args,
)
from sagnn_tpu.train.trainer import graphs_to_device


def _random_graph(rng, U, I, E):
    tgt = np.sort(rng.integers(0, U, E, dtype=np.int32))
    src = rng.integers(0, I, E, dtype=np.int32)
    return src, tgt


def test_plan_structure():
    rng = np.random.default_rng(0)
    U, I, E = 400, 300, 3000
    src, tgt = _random_graph(rng, U, I, E)
    p = plan_spmm(src, tgt, U)
    # every chunk's targets live inside one R-row block
    for c in range(p.num_chunks):
        tl = p.tgt_local[c]
        real = tl[tl < R]
        assert (real >= 0).all() and (real < R).all()
    # chunk_first marks exactly one first per visited block
    blocks = p.chunk_block
    for b in np.unique(blocks):
        idx = np.nonzero(blocks == b)[0]
        assert p.chunk_first[idx[0]] == 1
        assert (p.chunk_first[idx[1:]] == 0).all() or b == p.num_blocks
    # block sequence is non-decreasing (output revisiting requirement)
    assert (np.diff(blocks) >= 0).all()


def test_spmm_matches_dense():
    rng = np.random.default_rng(1)
    U, I, D, E = 500, 350, 64, 8000
    src, tgt = _random_graph(rng, U, I, E)
    X = rng.standard_normal((I, D)).astype(np.float32)
    p = plan_spmm(src, tgt, U)
    out = spmm_apply(jnp.asarray(X), *_plan_args(p))
    expect = np.zeros((U, D), np.float32)
    np.add.at(expect, tgt, X[src])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-4)


def test_spmm_empty_graph():
    p = plan_spmm(np.zeros(0, np.int32), np.zeros(0, np.int32), 200)
    X = jnp.ones((100, 64))
    out = spmm_apply(X, *_plan_args(p))
    assert out.shape == (200, 64)
    assert float(jnp.abs(out).max()) == 0.0


def test_spmm_grad_is_transpose():
    rng = np.random.default_rng(2)
    U, I, D, E = 300, 250, 64, 5000
    src, tgt = _random_graph(rng, U, I, E)
    X = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))
    fwd = plan_spmm(src, tgt, U)
    o = np.argsort(src, kind="stable")
    bwd = plan_spmm(tgt[o], src[o], I)
    G = jnp.asarray(rng.standard_normal((U, D)).astype(np.float32))
    dx = jax.grad(lambda x: jnp.sum(spmm_from_plans(x, fwd, bwd) * G))(X)
    A = sp.coo_matrix((np.ones(E), (tgt, src)), shape=(U, I)).tocsr()
    # duplicate edges sum in A — matches kernel edge-multiplicity handling
    expect = A.T @ np.asarray(G)
    np.testing.assert_allclose(np.asarray(dx), expect, rtol=1e-4, atol=1e-3)


def test_sliced_spmm_matches():
    rng = np.random.default_rng(3)
    U, I, D, E = 700, 500, 32, 20000
    tgt = np.sort(rng.integers(0, U, E, dtype=np.int32))
    src = rng.integers(0, I, E, dtype=np.int32)
    X = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))
    expect = np.zeros((U, D), np.float32)
    np.add.at(expect, tgt, np.asarray(X)[src])
    for S in (2, 4):
        p = plan_spmm(src, tgt, U, num_slices=S)
        out = spmm_apply(X, *_plan_args(p), num_slices=S)
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5,
                                   atol=1e-4)


@pytest.mark.slow
def test_model_pallas_matches_xla():
    cfg_x = ModelConfig(graph_num=3, gnn_layer=2, att_layer=1, latdim=16,
                        num_heads=4, ssldim=8, pos_length=12, leaky=0.5,
                        spmm_backend="xla")
    cfg_p = ModelConfig(graph_num=3, gnn_layer=2, att_layer=1, latdim=16,
                        num_heads=4, ssldim=8, pos_length=12, leaky=0.5,
                        spmm_backend="pallas")
    bundle = synthetic_dataset(num_users=40, num_items=60, graph_num=3,
                               seed=5)
    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=8)
    graphs = graphs_to_device(gb)
    plans = build_stacked_plans(gb.u_src, gb.u_tgt, gb.i_src, gb.i_tgt,
                                gb.num_users, gb.num_items, gb.edge_counts)
    graphs_p = dict(graphs)
    graphs_p["plans"] = {
        "u": {k: jnp.asarray(v) for k, v in plans["u"].items()},
        "i": {k: jnp.asarray(v) for k, v in plans["i"].items()},
    }
    mx = SelfGNN(cfg_x, bundle.num_users, bundle.num_items)
    mp = SelfGNN(cfg_p, bundle.num_users, bundle.num_items)
    params = mx.init(jax.random.PRNGKey(0))
    fx = mx.encode(params, graphs, train=False)
    fp = mp.encode(params, graphs_p, train=False)
    for a, b in zip(fx, fp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    # gradients agree too (pallas custom VJP vs XLA autodiff)
    def loss(model, g):
        def f(p):
            fu, fi, uv, iv = model.encode(p, g, train=False)
            return jnp.sum(fu ** 2) + jnp.sum(fi ** 2)
        return f

    gx = jax.grad(loss(mx, graphs))(params)
    gp = jax.grad(loss(mp, graphs_p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gx),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_native_planner_matches_python():
    """native/planner.cc must produce byte-identical schedules to the
    Python planner (stable source sort within target blocks, same chunk and
    padding conventions, same edge tracking)."""
    from sagnn_tpu.ops import native_planner
    from sagnn_tpu.ops.spmm_pallas import _plan_spmm_native

    if not native_planner.available():
        pytest.skip("native planner not built")
    rng = np.random.default_rng(3)
    # cs != 1024 cases pin the native planner at the auto-selected chunk
    # sizes production now uses for low-fill graphs (choose_chunk_size)
    for U, I, E, slices, track, cs in ((700, 500, 9000, 1, False, 1024),
                                       (700, 500, 9000, 1, True, 1024),
                                       (64, 500, 5000, 4, True, 1024),
                                       (2000, 100, 50, 1, True, 1024),
                                       (700, 500, 9000, 1, True, 512),
                                       (2000, 100, 6000, 1, False, 256)):
        src, tgt = _random_graph(rng, U, I, E)
        eids = (np.random.default_rng(5).permutation(E).astype(np.int32)
                if track else None)
        # python reference path (below the native-dispatch threshold)
        py = plan_spmm(src, tgt, U, num_slices=slices, edge_ids=eids,
                       track_edges=track, chunk_size=cs)
        nat = _plan_spmm_native(src.astype(np.int32), tgt.astype(np.int32),
                                (eids if eids is not None else
                                 (np.arange(E, dtype=np.int32) if track
                                  else None)),
                                E, U, None, True, cs, slices, track,
                                len(src))
        np.testing.assert_array_equal(nat.src, py.src)
        np.testing.assert_array_equal(nat.tgt_local, py.tgt_local)
        np.testing.assert_array_equal(nat.chunk_block, py.chunk_block)
        np.testing.assert_array_equal(nat.chunk_first, py.chunk_first)
        assert nat.num_blocks == py.num_blocks
        if track:
            np.testing.assert_array_equal(nat.edge_slot, py.edge_slot)
            np.testing.assert_array_equal(nat.edge_pos, py.edge_pos)


def test_choose_chunk_size():
    """Auto chunk size: high-fill blocks keep CS=1024; low-fill blocks
    (gowalla-like ~1.3k edges per 128-row target block) drop to 512/256
    rather than padding every block's tail chunk to 1024."""
    from sagnn_tpu.ops.spmm_pallas import choose_chunk_size

    rng = np.random.default_rng(0)
    num_tgt = 128 * 40

    def stacked(edges_per_interval):
        tgt = np.sort(rng.integers(0, num_tgt, edges_per_interval)
                      .astype(np.int32))
        return tgt[None, :], np.asarray([edges_per_interval])

    # ~10.4k edges/block (the 4M-edge bench regime): fill at 1024 is high
    t, ec = stacked(40 * 10_400)
    assert choose_chunk_size(t, ec, num_tgt) == 1024
    # ~1.3k edges/block (gowalla regime): tail-chunk padding dominates
    t, ec = stacked(40 * 1_300)
    assert choose_chunk_size(t, ec, num_tgt) in (256, 512)
    # near-empty graph: smallest chunks
    t, ec = stacked(40 * 8)
    assert choose_chunk_size(t, ec, num_tgt) == 256

    # skewed intervals (one dense + many near-empty): plans pad every
    # interval to the LARGEST interval's chunk count, so the dense
    # interval dictates the choice — the cost is max_k(chunks), not sum_k
    dense, _ = stacked(40 * 10_400)
    E = dense.shape[1]
    sparse = np.sort(rng.integers(0, num_tgt, 100).astype(np.int32))
    rows = [dense[0]] + [np.pad(sparse, (0, E - len(sparse)))] * 11
    t = np.stack(rows)
    ec = np.asarray([E] + [len(sparse)] * 11)
    assert choose_chunk_size(t, ec, num_tgt) == 1024


def test_auto_chunk_plans_match_oracle():
    """Plans built with auto-selected (non-1024) chunk sizes still compute
    the exact segment sum."""
    from sagnn_tpu.ops.spmm_pallas import build_stacked_plans, spmm_apply

    rng = np.random.default_rng(4)
    U, I, E, D = 900, 700, 4000, 16
    src, tgt = _random_graph(rng, U, I, E)   # user-direction: tgt = users
    o = np.argsort(src, kind="stable")       # item-direction: tgt = items
    isrc, itgt = tgt[o].copy(), src[o].copy()
    plans = build_stacked_plans(src[None], tgt[None], isrc[None],
                                itgt[None], U, I, np.asarray([E]))
    assert plans["u"]["tgt_local"].shape[-1] < 1024  # auto picked smaller
    x = jnp.asarray(rng.standard_normal((I, D)), jnp.float32)
    u = plans["u"]
    got = spmm_apply(x, jnp.asarray(u["src"][0]),
                     jnp.asarray(u["tgt_local"][0]),
                     jnp.asarray(u["chunk_block"][0]),
                     jnp.asarray(u["chunk_first"][0]),
                     plans["num_blocks_u"], U, exact=True)
    want = np.zeros((U, D), np.float32)
    np.add.at(want, tgt, np.asarray(x)[src])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_src_sharded_spmm_matches_oracle():
    """Source-sharded SpMM (per-shard fast-path gathers + zero_init
    accumulation) matches the dense oracle fwd and grad, including empty
    shards and shard counts that do not divide num_src."""
    from sagnn_tpu.ops.spmm_pallas import (plan_spmm_src_sharded,
                                           spmm_apply_src_sharded,
                                           spmm_src_sharded, _sharded_args)

    rng = np.random.default_rng(7)
    U, I, D, E = 900, 700, 16, 12000
    src, tgt = _random_graph(rng, U, I, E)
    # leave a source range untouched so one shard is empty
    src = np.where((src >= 300) & (src < 400), 50, src).astype(np.int32)
    X = rng.standard_normal((I, D)).astype(np.float32)
    expect = np.zeros((U, D), np.float32)
    np.add.at(expect, tgt, X[src])

    for shard_rows in (100, 256, 1024):
        p = plan_spmm_src_sharded(src, tgt, U, I, shard_rows)
        assert p["num_shards"] == -(-I // shard_rows)
        out = spmm_apply_src_sharded(
            jnp.asarray(X), jnp.asarray(p["src"]),
            jnp.asarray(p["tgt_local"]), jnp.asarray(p["chunk_block"]),
            jnp.asarray(p["chunk_first"]), p["num_blocks"], U, shard_rows)
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5,
                                   atol=1e-4)

    # differentiable wrapper: grad == transpose SpMM
    o = np.argsort(src, kind="stable")
    bsrc, btgt = tgt[o].copy(), src[o].copy()
    fp = plan_spmm_src_sharded(src, tgt, U, I, 256)
    bp = plan_spmm_src_sharded(bsrc, btgt, I, U, 256)
    fa, fnb, fnt, fsr = _sharded_args(fp)
    ba, bnb, bnt, bsr = _sharded_args(bp)
    G = jnp.asarray(rng.standard_normal((U, D)).astype(np.float32))

    def f(x):
        return jnp.sum(spmm_src_sharded(x, fa, ba, fnb, fnt, fsr,
                                        bnb, bnt, bsr, I) * G)

    dx = jax.grad(f)(jnp.asarray(X))
    import scipy.sparse as ssp
    A = ssp.coo_matrix((np.ones(E), (tgt, src)), shape=(U, I)).tocsr()
    np.testing.assert_allclose(np.asarray(dx), A.T @ np.asarray(G),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.slow
def test_model_src_sharded_backend_matches_xla():
    """spmm_src_shard_rows as a real model backend: encoding + grads match
    the XLA path with the source tables split into multiple shards (the
    >32MB-gather-cliff configuration, forced small here)."""
    from sagnn_tpu.ops.spmm_pallas import build_stacked_plans_src_sharded

    cfg_x = ModelConfig(graph_num=3, gnn_layer=2, att_layer=1, latdim=16,
                        num_heads=4, ssldim=8, pos_length=12, leaky=0.5,
                        spmm_backend="xla")
    cfg_s = ModelConfig(graph_num=3, gnn_layer=2, att_layer=1, latdim=16,
                        num_heads=4, ssldim=8, pos_length=12, leaky=0.5,
                        spmm_backend="pallas", spmm_src_shard_rows=16)
    bundle = synthetic_dataset(num_users=40, num_items=60, graph_num=3,
                               seed=5)
    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=8)
    graphs = graphs_to_device(gb)
    ss = build_stacked_plans_src_sharded(
        gb.u_src, gb.u_tgt, gb.i_src, gb.i_tgt, gb.num_users, gb.num_items,
        gb.edge_counts, shard_rows=16)
    # multi-shard in both directions: 40 users -> 3 shards, 60 items -> 4
    assert ss["u"]["src"].shape[1] == 4 and ss["i"]["src"].shape[1] == 3
    graphs_s = dict(graphs)
    graphs_s["plans_ss"] = {
        "u": {k: jnp.asarray(v) for k, v in ss["u"].items()},
        "i": {k: jnp.asarray(v) for k, v in ss["i"].items()},
    }
    mx = SelfGNN(cfg_x, bundle.num_users, bundle.num_items)
    ms = SelfGNN(cfg_s, bundle.num_users, bundle.num_items)
    params = mx.init(jax.random.PRNGKey(0))
    fx = mx.encode(params, graphs, train=False)
    fs = ms.encode(params, graphs_s, train=False)
    for a, b in zip(fx, fs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    # sub-sliced chunk streams (max_slice_slots forces K>1 scan slices per
    # shard) produce the same encoding
    ss2 = build_stacked_plans_src_sharded(
        gb.u_src, gb.u_tgt, gb.i_src, gb.i_tgt, bundle.num_users,
        bundle.num_items, gb.edge_counts, shard_rows=16,
        max_slice_slots=64)
    assert ss2["u"]["src"].shape[1] > ss["u"]["src"].shape[1]
    graphs_s2 = dict(graphs)
    graphs_s2["plans_ss"] = {
        d: {k: jnp.asarray(v) for k, v in ss2[d].items()}
        for d in ("u", "i")}
    fs2 = ms.encode(params, graphs_s2, train=False)
    for a, b in zip(fx, fs2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    def loss(model, g):
        def f(p):
            fu, fi, uv, iv = model.encode(p, g, train=False)
            return jnp.sum(fu ** 2) + jnp.sum(fi ** 2)
        return f

    gx = jax.grad(loss(mx, graphs))(params)
    gs = jax.grad(loss(ms, graphs_s))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gx),
                    jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_src_sharded_trainer_end_to_end(tmp_path):
    """Trainer auto-wiring: explicit spmm_src_shard_rows trains end-to-end
    (fwd+bwd+Adam through the sharded-gather custom VJP)."""
    from sagnn_tpu.config import Config, TrainConfig
    from sagnn_tpu.train.trainer import Trainer

    bundle = synthetic_dataset(num_users=40, num_items=60, graph_num=2,
                               test_size=10, seed=11)
    cfg = Config(
        model=ModelConfig(graph_num=2, gnn_layer=2, att_layer=1, latdim=16,
                          num_heads=4, ssldim=8, pos_length=12,
                          keep_rate=1.0, spmm_backend="pallas",
                          spmm_src_shard_rows=16),
        train=TrainConfig(batch=8, samp_num=3, ssl_num=2, trn_num=24,
                          test_size=10, lr=1e-2),
    )
    tr = Trainer(cfg, bundle, ckpt_root=str(tmp_path), pad_multiple=32)
    assert "plans_ss" in tr.graphs and "plans" not in tr.graphs
    first = tr.train_epoch(verbose=False)
    assert np.isfinite(first["Loss"])
    for _ in range(3):
        last = tr.train_epoch(verbose=False)
    assert last["preLoss"] < first["preLoss"]
    mets = tr.test_epoch()
    assert 0.0 <= mets["HR"] <= 1.0


def test_folded_gather_matches_unfolded():
    """Row-folded exact-mode SpMM (spmm_fold_gather): gather src//2 from
    the [N/2, 2D] view, in-kernel parity half-select — values and grads
    must match the plain path exactly (same f32 message values reach the
    same HIGHEST-precision dots). Odd row counts silently fall back."""
    rng = np.random.default_rng(9)
    U, I, D, E = 384, 256, 64, 6000
    src, tgt = _random_graph(rng, U, I, E)
    X = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))
    fwd = plan_spmm(src, tgt, U)
    o = np.argsort(src, kind="stable")
    bwd = plan_spmm(tgt[o], src[o], I)

    plain = spmm_apply(X, *_plan_args(fwd))
    fold = spmm_apply(X, *_plan_args(fwd), folded=True)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(fold))

    # bf16 mode folds too (same relayout-padding economics)
    plain16 = spmm_apply(X, *_plan_args(fwd), exact=False)
    fold16 = spmm_apply(X, *_plan_args(fwd), exact=False, folded=True)
    np.testing.assert_array_equal(np.asarray(plain16), np.asarray(fold16))

    from sagnn_tpu.ops.spmm_pallas import spmm
    G = jnp.asarray(rng.standard_normal((U, D)).astype(np.float32))
    *fa, fnb, fnt = _plan_args(fwd)
    *ba, bnb, bnt = _plan_args(bwd)

    def loss(x, folded):
        return jnp.sum(spmm(x, tuple(fa), tuple(ba), fnb, fnt, bnb, bnt,
                            True, folded) * G)

    g_plain = jax.grad(loss)(X, False)
    g_fold = jax.grad(loss)(X, True)
    np.testing.assert_array_equal(np.asarray(g_plain), np.asarray(g_fold))

    # odd row count: silent fallback, still correct
    X_odd = X[:-1]
    p_odd = plan_spmm(src[src < I - 1], tgt[src < I - 1], U)
    out_f = spmm_apply(X_odd, *_plan_args(p_odd), folded=True)
    out_p = spmm_apply(X_odd, *_plan_args(p_odd))
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_p))


def test_folded_gather_src_sharded_matches():
    """Folded gathers on the source-sharded path (the 1M-node exact-mode
    lever): per-shard windows into the folded table."""
    from sagnn_tpu.ops.spmm_pallas import (
        plan_spmm_src_sharded, spmm_apply_src_sharded)

    rng = np.random.default_rng(10)
    U, I, D, E = 512, 384, 64, 9000
    src, tgt = _random_graph(rng, U, I, E)
    X = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))
    ss = plan_spmm_src_sharded(src, tgt, U, I, shard_rows=128)
    args = (jnp.asarray(ss["src"]), jnp.asarray(ss["tgt_local"]),
            jnp.asarray(ss["chunk_block"]), jnp.asarray(ss["chunk_first"]))
    plain = spmm_apply_src_sharded(X, *args, ss["num_blocks"],
                                   ss["num_tgt"], ss["shard_rows"])
    fold = spmm_apply_src_sharded(X, *args, ss["num_blocks"],
                                  ss["num_tgt"], ss["shard_rows"],
                                  folded=True)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(fold))
    expect = np.zeros((U, D), np.float32)
    np.add.at(expect, tgt, np.asarray(X)[src])
    np.testing.assert_allclose(np.asarray(fold), expect, rtol=1e-5,
                               atol=1e-4)


def test_model_fold_gather_matches():
    """End-to-end: spmm_fold_gather=True model forward equals the plain
    pallas backend bitwise (exact mode)."""
    bundle = synthetic_dataset(num_users=64, num_items=48, graph_num=2,
                               seed=5)
    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=64)
    graphs = graphs_to_device(gb)
    plans = build_stacked_plans(gb.u_src, gb.u_tgt, gb.i_src, gb.i_tgt,
                                gb.num_users, gb.num_items, gb.edge_counts)
    graphs["plans"] = {d: {k: jnp.asarray(v) for k, v in plans[d].items()}
                       for d in ("u", "i")}
    base = ModelConfig(graph_num=2, gnn_layer=2, att_layer=1, latdim=16,
                       num_heads=4, ssldim=8, pos_length=12,
                       spmm_backend="pallas")
    import dataclasses
    m_plain = SelfGNN(base, 64, 48)
    m_fold = SelfGNN(dataclasses.replace(base, spmm_fold_gather=True),
                     64, 48)
    params = m_plain.init(jax.random.PRNGKey(0))
    fu_p, fi_p, _, _ = m_plain.encode(params, graphs)
    fu_f, fi_f, _, _ = m_fold.encode(params, graphs)
    np.testing.assert_array_equal(np.asarray(fu_p), np.asarray(fu_f))
    np.testing.assert_array_equal(np.asarray(fi_p), np.asarray(fi_f))


def test_folded_sliced_spmm_matches():
    """Fold on the out-of-core sliced path (num_slices>1): each slice
    gathers from the folded view with zero_init accumulation."""
    rng = np.random.default_rng(11)
    U, I, D, E = 640, 512, 64, 15000
    tgt = np.sort(rng.integers(0, U, E, dtype=np.int32))
    src = rng.integers(0, I, E, dtype=np.int32)
    X = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))
    expect = np.zeros((U, D), np.float32)
    np.add.at(expect, tgt, np.asarray(X)[src])
    for S in (2, 4):
        p = plan_spmm(src, tgt, U, num_slices=S)
        plain = spmm_apply(X, *_plan_args(p), num_slices=S)
        fold = spmm_apply(X, *_plan_args(p), num_slices=S, folded=True)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(fold))
        np.testing.assert_allclose(np.asarray(fold), expect, rtol=1e-5,
                                   atol=1e-4)
