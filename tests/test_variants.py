"""Tests for non-parity variants and library-completeness components:
per-token sequence attention, masked MHSA, additive attention, batch norm,
functional edge dropout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sagnn_tpu.config import ModelConfig
from sagnn_tpu.data.graph import compile_interval_graphs
from sagnn_tpu.data.synthetic import synthetic_dataset
from sagnn_tpu.models.layers import batch_norm, dropout, fc
from sagnn_tpu.models.selfgnn import SelfGNN
from sagnn_tpu.ops.attention import (
    additive_attention, init_additive_attention_params,
    init_mhsa_params, multi_head_self_attention,
)
from sagnn_tpu.ops.segment import edge_dropout_weights, propagate
from sagnn_tpu.train.trainer import graphs_to_device


def test_masked_mhsa_ignores_masked_keys():
    rng = np.random.RandomState(0)
    B, T, D, H = 3, 6, 16, 4
    p = init_mhsa_params(jax.random.PRNGKey(0), D)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 1, 0, 0, 0]] * B, np.float32))
    # changing masked positions must not change unmasked outputs
    x2 = x.at[:, 3:].set(99.0)
    for stable in (False, True):
        o1 = multi_head_self_attention(p, x, 4, stable=stable, mask=mask)
        o2 = multi_head_self_attention(p, x2, 4, stable=stable, mask=mask)
        np.testing.assert_allclose(np.asarray(o1[:, :3]),
                                   np.asarray(o2[:, :3]), rtol=1e-4,
                                   atol=1e-5)


def test_additive_attention_pools():
    rng = np.random.RandomState(1)
    B, T, D, Q = 4, 5, 8, 6
    p = init_additive_attention_params(jax.random.PRNGKey(1), Q, D)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    out = additive_attention(p, x)
    assert out.shape == (B, D)
    # weights sum to 1: pooled output within the convex hull of inputs
    assert float(jnp.abs(out).max()) <= float(jnp.abs(x).max()) + 1e-5


def test_batch_norm_train_and_eval():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(64, 8).astype(np.float32) * 3 + 1)
    scale = jnp.ones(8)
    shift = jnp.zeros(8)
    y, m, v = batch_norm(x, scale, shift, jnp.zeros(8), jnp.ones(8),
                         train=True)
    assert abs(float(y.mean())) < 1e-3
    # eval path uses the EMA stats
    y2, m2, v2 = batch_norm(x, scale, shift, m, v, train=False)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m2))


def test_dropout_scaling():
    x = jnp.ones((1000, 4))
    y = dropout(jax.random.PRNGKey(0), x, rate=0.5)
    zeros = np.asarray(y) == 0
    assert 0.4 < zeros.mean() < 0.6
    nz = np.asarray(y)[~zeros]
    np.testing.assert_allclose(nz, 2.0)


def test_fc_matches_manual():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(5, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(3).astype(np.float32))
    y = fc(x, w, b, activation="leakyRelu", leaky=0.5)
    ref = np.asarray(x) @ np.asarray(w) + np.asarray(b)
    ref = np.maximum(0.5 * ref, ref)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-6)


def test_edge_dropout_weights():
    w = edge_dropout_weights(jax.random.PRNGKey(0), 10000, keep_rate=0.8)
    nz = np.asarray(w) > 0
    assert 0.75 < nz.mean() < 0.85
    np.testing.assert_allclose(np.asarray(w)[nz], 1.0 / 0.8, rtol=1e-6)
    # weighted propagate drops those edges' messages
    import scipy.sparse as sp
    rng = np.random.RandomState(4)
    U, I, D, E = 50, 40, 8, 300
    tgt = np.sort(rng.randint(0, U, E)).astype(np.int32)
    src = rng.randint(0, I, E).astype(np.int32)
    x = jnp.asarray(rng.randn(I, D).astype(np.float32))
    w = edge_dropout_weights(jax.random.PRNGKey(1), E, keep_rate=0.5)
    out = propagate(x, jnp.asarray(src), jnp.asarray(tgt), U, leaky=1.0,
                    weights=w)
    expect = np.zeros((U, D), np.float32)
    wn = np.asarray(w)
    for e in range(E):
        expect[tgt[e]] += wn[e] * np.asarray(x)[src[e]]
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)


def test_per_token_sequence_branch_runs_and_differs():
    bundle = synthetic_dataset(num_users=24, num_items=40, graph_num=2,
                               seed=7)
    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=8)
    graphs = graphs_to_device(gb)
    base = dict(graph_num=2, gnn_layer=1, att_layer=2, latdim=16,
                num_heads=4, ssldim=8, pos_length=10)
    m_pool = SelfGNN(ModelConfig(**base), 24, 40)
    m_tok = SelfGNN(ModelConfig(**base, per_token_seq_attention=True), 24, 40)
    params = m_pool.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(5)
    uids = jnp.asarray(rng.randint(0, 24, 6).astype(np.int32))
    cand = jnp.asarray(rng.randint(0, 40, (6, 5)).astype(np.int32))
    seq = jnp.asarray(rng.randint(0, 40, (6, 10)).astype(np.int32))
    mask = jnp.asarray((rng.rand(6, 10) > 0.3).astype(np.float32))
    s_pool = m_pool.score_candidates(params, graphs, uids, cand, seq, mask)
    s_tok = m_tok.score_candidates(params, graphs, uids, cand, seq, mask)
    assert np.isfinite(np.asarray(s_tok)).all()
    assert not np.allclose(np.asarray(s_pool), np.asarray(s_tok))


def test_edge_norm_variant_xla_vs_pallas():
    """sym-sqrt normalized propagation (Q2 variant): the XLA weighted
    segment-sum path and the Pallas weighted-SpMM path must agree, and both
    must differ from the unweighted parity path."""
    from sagnn_tpu.data.graph import direction_permutation, edge_weights
    from sagnn_tpu.models.selfgnn import _interval_propagation
    from sagnn_tpu.ops.spmm_pallas import build_stacked_plans

    bundle = synthetic_dataset(num_users=48, num_items=64, graph_num=2,
                               seed=9)
    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=8)
    graphs = graphs_to_device(gb)
    ew = edge_weights(gb, bundle.sub_mats)
    graphs["edge_weights"] = jnp.asarray(ew)
    perm = direction_permutation(gb, bundle.sub_mats)
    plans = build_stacked_plans(gb.u_src, gb.u_tgt, gb.i_src, gb.i_tgt,
                                gb.num_users, gb.num_items, gb.edge_counts,
                                track_edges=True, i_edge_ids=perm)
    graphs["plans"] = {
        "u": {k: jnp.asarray(v) for k, v in plans["u"].items()},
        "i": {k: jnp.asarray(v) for k, v in plans["i"].items()},
    }
    base = dict(graph_num=2, gnn_layer=2, latdim=16, num_heads=4, ssldim=8,
                pos_length=10)
    cfg_x = ModelConfig(**base, edge_norm="sym_sqrt")
    cfg_p = ModelConfig(**base, edge_norm="sym_sqrt", spmm_backend="pallas")
    cfg_parity = ModelConfig(**base)
    params = SelfGNN(cfg_x, 48, 64).init(jax.random.PRNGKey(3))

    uv_x, iv_x = _interval_propagation(params, graphs, cfg_x, 48, 64)
    uv_p, iv_p = _interval_propagation(params, graphs, cfg_p, 48, 64)
    uv_0, _ = _interval_propagation(params, graphs, cfg_parity, 48, 64)
    np.testing.assert_allclose(np.asarray(uv_x), np.asarray(uv_p),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(iv_x), np.asarray(iv_p),
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(uv_x), np.asarray(uv_0))


def test_edge_norm_mean_xla_vs_pallas():
    """'mean' norm is direction-DEPENDENT (1/target_deg per hop): the Pallas
    path must take per-direction canonical weights (edge_weights_canon), and
    both backends must agree with a scipy oracle for one hop."""
    from sagnn_tpu.data.graph import (direction_permutation, edge_weights,
                                      edge_weights_canonical)
    from sagnn_tpu.models.selfgnn import _interval_propagation
    from sagnn_tpu.ops.spmm_pallas import build_stacked_plans

    bundle = synthetic_dataset(num_users=48, num_items=64, graph_num=2,
                               seed=13)
    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=8)
    graphs = graphs_to_device(gb)
    ew = edge_weights(gb, bundle.sub_mats, norm="mean")
    graphs["edge_weights"] = jnp.asarray(ew)
    perm = direction_permutation(gb, bundle.sub_mats)
    graphs["edge_weights_canon"] = jnp.asarray(
        edge_weights_canonical(ew, perm))
    plans = build_stacked_plans(gb.u_src, gb.u_tgt, gb.i_src, gb.i_tgt,
                                gb.num_users, gb.num_items, gb.edge_counts,
                                track_edges=True, i_edge_ids=perm)
    graphs["plans"] = {
        "u": {k: jnp.asarray(v) for k, v in plans["u"].items()},
        "i": {k: jnp.asarray(v) for k, v in plans["i"].items()},
    }
    base = dict(graph_num=2, gnn_layer=1, latdim=16, num_heads=4, ssldim=8,
                pos_length=10, leaky=1.0)  # 1 hop, linear act: scipy-checkable
    cfg_x = ModelConfig(**base, edge_norm="mean")
    cfg_p = ModelConfig(**base, edge_norm="mean", spmm_backend="pallas")
    params = SelfGNN(cfg_x, 48, 64).init(jax.random.PRNGKey(7))

    uv_x, iv_x = _interval_propagation(params, graphs, cfg_x, 48, 64)
    uv_p, iv_p = _interval_propagation(params, graphs, cfg_p, 48, 64)
    np.testing.assert_allclose(np.asarray(uv_x), np.asarray(uv_p),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(iv_x), np.asarray(iv_p),
                               rtol=1e-5, atol=1e-5)

    # scipy oracle, one hop with leaky=1 (identity act): the layer-sum
    # (tf.add_n over [u0, hop+u0]) gives 2·u0 + rownorm(A) @ i0
    for k in range(2):
        m = (bundle.sub_mats[k] != 0).astype(np.float64)
        u0 = np.asarray(params["reg"]["u_embed"][k], np.float64)
        i0 = np.asarray(params["reg"]["i_embed"][k], np.float64)
        deg_u = np.maximum(np.asarray(m.sum(axis=1)).ravel(), 1.0)
        deg_i = np.maximum(np.asarray(m.sum(axis=0)).ravel(), 1.0)
        exp_u = 2 * u0 + (m @ i0) / deg_u[:, None]
        exp_i = 2 * i0 + (m.T @ u0) / deg_i[:, None]
        np.testing.assert_allclose(np.asarray(uv_x[k]), exp_u, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(iv_x[k]), exp_i, rtol=1e-4,
                                   atol=1e-4)


def test_edge_norm_variant_grads_match():
    """Gradients w.r.t. the node tables agree across backends (the Pallas
    path runs its custom VJP incl. the SDDMM dw branch)."""
    from sagnn_tpu.data.graph import direction_permutation, edge_weights
    from sagnn_tpu.models.selfgnn import _interval_propagation
    from sagnn_tpu.ops.spmm_pallas import build_stacked_plans

    bundle = synthetic_dataset(num_users=32, num_items=40, graph_num=2,
                               seed=11)
    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=8)
    graphs = graphs_to_device(gb)
    graphs["edge_weights"] = jnp.asarray(edge_weights(gb, bundle.sub_mats))
    perm = direction_permutation(gb, bundle.sub_mats)
    plans = build_stacked_plans(gb.u_src, gb.u_tgt, gb.i_src, gb.i_tgt,
                                gb.num_users, gb.num_items, gb.edge_counts,
                                track_edges=True, i_edge_ids=perm)
    graphs["plans"] = {
        "u": {k: jnp.asarray(v) for k, v in plans["u"].items()},
        "i": {k: jnp.asarray(v) for k, v in plans["i"].items()},
    }
    base = dict(graph_num=2, gnn_layer=2, latdim=16, num_heads=4, ssldim=8,
                pos_length=10)
    cfg_x = ModelConfig(**base, edge_norm="sym_sqrt")
    cfg_p = ModelConfig(**base, edge_norm="sym_sqrt", spmm_backend="pallas")
    params = SelfGNN(cfg_x, 32, 40).init(jax.random.PRNGKey(4))

    def loss(params, cfg):
        uv, iv = _interval_propagation(params, graphs, cfg, 32, 40)
        return jnp.sum(uv ** 2) + jnp.sum(iv ** 2)

    gx = jax.grad(loss)(params, cfg_x)
    gp = jax.grad(loss)(params, cfg_p)
    np.testing.assert_allclose(np.asarray(gx["reg"]["u_embed"]),
                               np.asarray(gp["reg"]["u_embed"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx["reg"]["i_embed"]),
                               np.asarray(gp["reg"]["i_embed"]),
                               rtol=1e-4, atol=1e-4)


def test_remat_propagation_same_values_and_grads():
    """remat_propagation must not change outputs or gradients (only the
    backward-pass memory/recompute schedule)."""
    import dataclasses
    from sagnn_tpu.models.selfgnn import _interval_propagation

    bundle = synthetic_dataset(num_users=32, num_items=40, graph_num=2,
                               seed=13)
    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=8)
    graphs = graphs_to_device(gb)
    base = ModelConfig(graph_num=2, gnn_layer=2, latdim=16, num_heads=4,
                       ssldim=8, pos_length=10)
    remat = dataclasses.replace(base, remat_propagation=True)
    params = SelfGNN(base, 32, 40).init(jax.random.PRNGKey(7))

    def loss(p, cfg):
        uv, iv = _interval_propagation(p, graphs, cfg, 32, 40)
        return jnp.sum(uv ** 2) + jnp.sum(iv ** 2)

    v0, g0 = jax.value_and_grad(lambda p: loss(p, base))(params)
    v1, g1 = jax.value_and_grad(lambda p: loss(p, remat))(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g0["reg"]["u_embed"]),
                               np.asarray(g1["reg"]["u_embed"]),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_fusion_dtype_bf16_runs_and_tracks_f32():
    """bf16 fusion stack: finite, close to the f32 path, grads flow."""
    import dataclasses
    bundle = synthetic_dataset(num_users=24, num_items=40, graph_num=2,
                               seed=14)
    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=8)
    graphs = graphs_to_device(gb)
    base = ModelConfig(graph_num=2, gnn_layer=1, att_layer=2, latdim=16,
                       num_heads=4, ssldim=8, pos_length=10,
                       stable_softmax=True)
    bf16 = dataclasses.replace(base, fusion_dtype="bf16")
    m32 = SelfGNN(base, 24, 40)
    mbf = SelfGNN(bf16, 24, 40)
    params = m32.init(jax.random.PRNGKey(8))
    fu32, fi32, _, _ = m32.encode(params, graphs)
    fubf, fibf, _, _ = mbf.encode(params, graphs)
    assert fubf.dtype == jnp.float32  # cast back at the boundary
    assert np.isfinite(np.asarray(fubf)).all()
    # bf16 has ~3 decimal digits; outputs track within that
    np.testing.assert_allclose(np.asarray(fubf), np.asarray(fu32),
                               rtol=0.05, atol=0.05)

    def loss(p, m):
        fu, fi, _, _ = m.encode(p, graphs)
        return jnp.sum(fu ** 2) + jnp.sum(fi ** 2)

    g = jax.grad(lambda p: loss(p, mbf))(params)
    leaves = jax.tree_util.tree_leaves(g["free"])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_edge_attention_model_backend_matches_reference():
    """edge_attention=True wires GAT-style propagation through the model's
    interval scan; compare against an independent XLA composition (segment
    softmax + weighted segment-sum, both directions, residuals)."""
    from sagnn_tpu.data.graph import direction_permutation
    from sagnn_tpu.models.selfgnn import _interval_propagation
    from sagnn_tpu.ops.segment import gather_segment_sum
    from sagnn_tpu.ops.spmm_pallas import build_stacked_plans

    bundle = synthetic_dataset(num_users=48, num_items=64, graph_num=2,
                               seed=17)
    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=8)
    graphs = graphs_to_device(gb)
    perm = direction_permutation(gb, bundle.sub_mats)
    plans = build_stacked_plans(gb.u_src, gb.u_tgt, gb.i_src, gb.i_tgt,
                                gb.num_users, gb.num_items, gb.edge_counts,
                                track_edges=True, i_edge_ids=perm)
    graphs["plans"] = {
        "u": {k: jnp.asarray(v) for k, v in plans["u"].items()},
        "i": {k: jnp.asarray(v) for k, v in plans["i"].items()},
    }
    base = dict(graph_num=2, gnn_layer=2, latdim=16, num_heads=4, ssldim=8,
                pos_length=10)
    cfg_a = ModelConfig(**base, edge_attention=True, spmm_backend="pallas")
    cfg_sum = ModelConfig(**base)
    params = SelfGNN(cfg_a, 48, 64).init(jax.random.PRNGKey(9))

    uv_a, iv_a = _interval_propagation(params, graphs, cfg_a, 48, 64)
    uv_s, _ = _interval_propagation(params, graphs, cfg_sum, 48, 64)
    assert np.isfinite(np.asarray(uv_a)).all()
    assert not np.allclose(np.asarray(uv_a), np.asarray(uv_s))

    # independent reference: per-interval, per-layer attention hops over
    # the SORTED per-direction edge lists (no shared canonical order)
    D = 16
    leaky = cfg_a.leaky
    for k in range(2):
        u0 = jnp.asarray(params["reg"]["u_embed"][k])
        i0 = jnp.asarray(params["reg"]["i_embed"][k])
        us, ut = jnp.asarray(gb.u_src[k]), jnp.asarray(gb.u_tgt[k])
        isrc, itgt = jnp.asarray(gb.i_src[k]), jnp.asarray(gb.i_tgt[k])
        n = int(gb.edge_counts[k])
        m_u = jnp.asarray((gb.u_tgt[k] < 48).astype(np.float32))
        m_i = jnp.asarray((gb.i_tgt[k] < 64).astype(np.float32))

        def att_hop(x_src, x_tgt, src, tgt, num_tgt, mask):
            s = jnp.sum(jnp.take(x_src, src, 0) * jnp.take(
                jnp.concatenate([x_tgt, jnp.zeros((1, D))]),
                jnp.minimum(tgt, num_tgt), 0), -1) / jnp.sqrt(float(D))
            s = jnp.where(mask > 0, s, -jnp.inf)
            mx = jax.ops.segment_max(s, tgt, num_segments=num_tgt + 1,
                                     indices_are_sorted=True)
            mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
            z = jnp.exp(s - jnp.take(mx, tgt)) * mask
            den = jax.ops.segment_sum(z, tgt, num_segments=num_tgt + 1,
                                      indices_are_sorted=True)
            w = z / jnp.maximum(jnp.take(den, tgt), 1e-9)
            agg = gather_segment_sum(x_src, src, tgt, num_tgt, weights=w)
            return jnp.maximum(leaky * agg, agg)

        embs0, embs1 = [u0], [i0]
        for _l in range(2):
            a0 = att_hop(embs1[-1], embs0[-1], us, ut, 48, m_u)
            a1 = att_hop(embs0[-1], embs1[-1], isrc, itgt, 64, m_i)
            embs0.append(a0 + embs0[-1])
            embs1.append(a1 + embs1[-1])
        exp_u = sum(embs0[1:], embs0[0])
        exp_i = sum(embs1[1:], embs1[0])
        np.testing.assert_allclose(np.asarray(uv_a[k]), np.asarray(exp_u),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(iv_a[k]), np.asarray(exp_i),
                                   rtol=1e-4, atol=1e-4)


def test_edge_attention_trainer_smoke():
    """Trainer wiring: edge_attention trains end-to-end and grads are
    finite (CPU interpret-mode pallas, tiny sizes)."""
    import dataclasses
    import tempfile
    from sagnn_tpu.config import Config, TrainConfig

    bundle = synthetic_dataset(num_users=24, num_items=32, graph_num=2,
                               test_size=8, seed=18)
    cfg = Config(
        model=ModelConfig(graph_num=2, gnn_layer=1, att_layer=1, latdim=16,
                          num_heads=4, ssldim=8, pos_length=12,
                          keep_rate=1.0, edge_attention=True,
                          spmm_backend="pallas"),
        train=TrainConfig(batch=8, samp_num=3, ssl_num=2, trn_num=16,
                          test_size=8, lr=1e-2),
    )
    from sagnn_tpu.train.trainer import Trainer
    with tempfile.TemporaryDirectory() as d:
        tr = Trainer(cfg, bundle, ckpt_root=d, pad_multiple=32)
        first = tr.train_epoch(verbose=False)
        assert np.isfinite(first["Loss"])
        for _ in range(3):
            last = tr.train_epoch(verbose=False)
        assert last["preLoss"] < first["preLoss"]


def test_edge_dropout_wired_model_level():
    """cfg.edge_dropout_keep (the WIRED Q1 variant): without a dropout rng
    (eval / parity) propagation is bit-equal to the unweighted path; with a
    rng it perturbs the output — on both the xla and pallas backends."""
    from sagnn_tpu.data.graph import direction_permutation
    from sagnn_tpu.models.selfgnn import _interval_propagation
    from sagnn_tpu.ops.spmm_pallas import build_stacked_plans

    bundle = synthetic_dataset(num_users=48, num_items=64, graph_num=2,
                               seed=9)
    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=8)
    graphs = graphs_to_device(gb)
    E = gb.u_src.shape[1]
    ones = np.ones((2, 2, E), np.float32)
    graphs["edge_weights"] = jnp.asarray(ones)
    graphs["edge_weights_canon"] = jnp.asarray(ones)
    perm = direction_permutation(gb, bundle.sub_mats)
    plans = build_stacked_plans(gb.u_src, gb.u_tgt, gb.i_src, gb.i_tgt,
                                gb.num_users, gb.num_items, gb.edge_counts,
                                track_edges=True, i_edge_ids=perm)
    graphs["plans"] = {
        "u": {k: jnp.asarray(v) for k, v in plans["u"].items()},
        "i": {k: jnp.asarray(v) for k, v in plans["i"].items()},
    }
    base = dict(graph_num=2, gnn_layer=2, latdim=16, num_heads=4, ssldim=8,
                pos_length=10)
    for backend in ("xla", "pallas"):
        cfg = ModelConfig(**base, spmm_backend=backend,
                          edge_dropout_keep=0.7)
        cfg0 = ModelConfig(**base, spmm_backend=backend)
        params = SelfGNN(cfg, 48, 64).init(jax.random.PRNGKey(3))
        uv0, _ = _interval_propagation(params, graphs, cfg0, 48, 64)
        uv_no_rng, _ = _interval_propagation(params, graphs, cfg, 48, 64)
        np.testing.assert_allclose(np.asarray(uv_no_rng), np.asarray(uv0),
                                   rtol=2e-6, atol=2e-6)
        uv_d, _ = _interval_propagation(params, graphs, cfg, 48, 64,
                                        dropout_rng=jax.random.PRNGKey(7))
        assert not np.allclose(np.asarray(uv_d), np.asarray(uv0))


def test_edge_dropout_trainer_smoke():
    """Trainer wiring: --edge_dropout_keep trains end-to-end (pallas
    backend builds tracked plans + unit canonical weights automatically)."""
    import tempfile
    from sagnn_tpu.config import Config, TrainConfig
    from sagnn_tpu.train.trainer import Trainer

    bundle = synthetic_dataset(num_users=24, num_items=32, graph_num=2,
                               test_size=8, seed=18)
    cfg = Config(
        model=ModelConfig(graph_num=2, gnn_layer=1, att_layer=1, latdim=16,
                          num_heads=4, ssldim=8, pos_length=12,
                          keep_rate=1.0, edge_dropout_keep=0.8,
                          spmm_backend="pallas"),
        train=TrainConfig(batch=8, samp_num=3, ssl_num=2, trn_num=16,
                          test_size=8, lr=1e-2),
    )
    with tempfile.TemporaryDirectory() as d:
        tr = Trainer(cfg, bundle, ckpt_root=d, pad_multiple=32)
        first = tr.train_epoch(verbose=False)
        assert np.isfinite(first["Loss"])
        for _ in range(3):
            last = tr.train_epoch(verbose=False)
        assert last["preLoss"] < first["preLoss"]


@pytest.mark.slow
def test_fusion_chunk_rows_matches_unchunked():
    """fusion_chunk_rows streams the row-parallel fusion stack in node
    blocks — bit-equal to the unchunked path at keep_rate=1."""
    import dataclasses
    bundle = synthetic_dataset(num_users=50, num_items=70, graph_num=3,
                               seed=4)
    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=8)
    graphs = graphs_to_device(gb)
    base = ModelConfig(graph_num=3, gnn_layer=1, att_layer=1, latdim=16,
                       num_heads=4, ssldim=8, pos_length=10, keep_rate=1.0)
    chunked = dataclasses.replace(base, fusion_chunk_rows=16)
    m0 = SelfGNN(base, 50, 70)
    m1 = SelfGNN(chunked, 50, 70)
    params = m0.init(jax.random.PRNGKey(2))
    f0 = m0.encode(params, graphs, train=False)
    f1 = m1.encode(params, graphs, train=False)
    np.testing.assert_allclose(np.asarray(f0[0]), np.asarray(f1[0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(f0[1]), np.asarray(f1[1]),
                               rtol=1e-6, atol=1e-6)
