"""Full-model parity: JAX forward vs the NumPy reference oracle.

This is the SURVEY.md §7.1 step-7 parity gate in miniature: identical params
in, per-layer activations allclose out.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sagnn_tpu.config import ModelConfig
from sagnn_tpu.data.graph import compile_interval_graphs
from sagnn_tpu.data.synthetic import synthetic_dataset
from sagnn_tpu.models.selfgnn import SelfGNN, TrainBatch, init_params, reg_loss
from sagnn_tpu.train.trainer import graphs_to_device

from tests import reference_oracle as oracle

CFG = ModelConfig(graph_num=3, gnn_layer=2, att_layer=2, latdim=16,
                  num_heads=4, ssldim=8, pos_length=12, leaky=0.5,
                  keep_rate=1.0)
U, I = 20, 30


@pytest.fixture(scope="module")
def setup():
    bundle = synthetic_dataset(num_users=U, num_items=I, graph_num=3,
                               seq_len_range=(4, 10), test_size=8, seed=3)
    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=8)
    graphs = graphs_to_device(gb)
    model = SelfGNN(CFG, U, I)
    params = model.init(jax.random.PRNGKey(42))
    params_np = jax.tree_util.tree_map(np.asarray, params)
    sub_dense = np.stack([m.toarray() for m in bundle.sub_mats])
    return bundle, model, params, params_np, graphs, sub_dense


def test_encode_parity(setup):
    bundle, model, params, params_np, graphs, sub_dense = setup
    fu, fi, uv, iv = model.encode(params, graphs, train=False)
    rng = np.random.RandomState(0)
    seq = rng.randint(0, I, size=(4, CFG.pos_length)).astype(np.int32)
    mask = (rng.rand(4, CFG.pos_length) > 0.4).astype(np.float32)
    acts = oracle.forward(params_np, sub_dense, CFG, seq, mask)
    np.testing.assert_allclose(np.asarray(uv), acts["user_vec"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(iv), acts["item_vec"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fu), acts["final_user"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fi), acts["final_item"],
                               rtol=1e-4, atol=1e-4)


def test_scoring_parity(setup):
    bundle, model, params, params_np, graphs, sub_dense = setup
    rng = np.random.RandomState(1)
    B = 4
    seq = rng.randint(0, I, size=(B, CFG.pos_length)).astype(np.int32)
    mask = (rng.rand(B, CFG.pos_length) > 0.4).astype(np.float32)
    user_ids = rng.randint(0, U, size=B).astype(np.int32)
    cand = rng.randint(0, I, size=(B, 6)).astype(np.int32)

    scores = model.score_candidates(params, graphs, jnp.asarray(user_ids),
                                    jnp.asarray(cand), jnp.asarray(seq),
                                    jnp.asarray(mask))
    acts = oracle.forward(params_np, sub_dense, CFG, seq, mask)
    # oracle scores via flat prediction path (model.py:169-173)
    expect = np.zeros((B, 6))
    for b in range(B):
        uids = np.full(6, user_ids[b])
        rows = np.full(6, b)
        expect[b] = oracle.predictions(acts, uids, cand[b], rows, CFG.leaky)
    np.testing.assert_allclose(np.asarray(scores), expect, rtol=1e-3,
                               atol=1e-3)


def test_train_losses_parity(setup):
    bundle, model, params, params_np, graphs, sub_dense = setup
    rng = np.random.RandomState(2)
    B, P, Pssl, g = 4, 10, 6, CFG.graph_num
    seq = rng.randint(0, I, size=(B, CFG.pos_length)).astype(np.int32)
    seq_mask = (rng.rand(B, CFG.pos_length) > 0.4).astype(np.float32)

    uids = rng.randint(0, U, size=P).astype(np.int32)
    pos_iids = rng.randint(0, I, size=P).astype(np.int32)
    neg_iids = rng.randint(0, I, size=P).astype(np.int32)
    useq_row = rng.randint(0, B, size=P).astype(np.int32)
    pair_mask = np.ones(P, np.float32)
    pair_mask[-3:] = 0.0  # exercise padding

    ssl_u_a = rng.randint(0, U, size=(g, Pssl)).astype(np.int32)
    ssl_i_a = rng.randint(0, I, size=(g, Pssl)).astype(np.int32)
    ssl_u_b = rng.randint(0, U, size=(g, Pssl)).astype(np.int32)
    ssl_i_b = rng.randint(0, I, size=(g, Pssl)).astype(np.int32)
    ssl_mask = np.ones((g, Pssl), np.float32)
    ssl_mask[:, -2:] = 0.0

    batch = TrainBatch(
        uids=jnp.asarray(uids), pos_iids=jnp.asarray(pos_iids),
        neg_iids=jnp.asarray(neg_iids), useq_row=jnp.asarray(useq_row),
        pair_mask=jnp.asarray(pair_mask), seq=jnp.asarray(seq),
        seq_mask=jnp.asarray(seq_mask), ssl_u_a=jnp.asarray(ssl_u_a),
        ssl_i_a=jnp.asarray(ssl_i_a), ssl_u_b=jnp.asarray(ssl_u_b),
        ssl_i_b=jnp.asarray(ssl_i_b), ssl_mask=jnp.asarray(ssl_mask))

    pre, ssl, _ = model.train_losses(params, graphs, batch, rng=None)

    acts = oracle.forward(params_np, sub_dense, CFG, seq, seq_mask)
    pos_preds = oracle.predictions(acts, uids, pos_iids, useq_row, CFG.leaky)
    neg_preds = oracle.predictions(acts, uids, neg_iids, useq_row, CFG.leaky)
    valid = pair_mask.astype(bool)
    hinge = np.maximum(0.0, 1.0 - (pos_preds - neg_preds))[valid]
    expect_pre = hinge.mean()

    pairs = []
    for k in range(g):
        vm = ssl_mask[k].astype(bool)
        pairs.append((ssl_u_a[k][vm], ssl_i_a[k][vm],
                      ssl_u_b[k][vm], ssl_i_b[k][vm]))
    expect_ssl = oracle.ssl_loss(acts, pairs, CFG.leaky)

    np.testing.assert_allclose(float(pre), expect_pre, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(ssl), expect_ssl, rtol=1e-3, atol=1e-3)


def test_reg_loss_covers_reference_regparams(setup):
    _, model, params, params_np, _, _ = setup
    got = float(reg_loss(params))
    reg = params_np["reg"]
    expect = sum(np.sum(np.square(v)) for v in jax.tree_util.tree_leaves(reg))
    np.testing.assert_allclose(got, expect, rtol=1e-5)
    # the Q6 throwaway FC weights must exist: g * gnn_layer * 2 of them
    assert reg["time_fc"].shape[0] == CFG.graph_num * CFG.gnn_layer * 2
