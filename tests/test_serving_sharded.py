"""Catalog-sharded serving (parallel/serving.py): the distributed-MIPS
top-k must match the single-device full-catalog path exactly at
recall_target=1.0 (the global top-k is a subset of per-shard top-ks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sagnn_tpu.config import ModelConfig
from sagnn_tpu.data.graph import compile_interval_graphs
from sagnn_tpu.data.synthetic import synthetic_dataset
from sagnn_tpu.models.selfgnn import SelfGNN
from sagnn_tpu.parallel.mesh import make_mesh
from sagnn_tpu.parallel.serving import (
    pad_catalog, shard_catalog, sharded_recommend_top_k, sharded_topk)
from sagnn_tpu.train.trainer import graphs_to_device

CFG = ModelConfig(graph_num=2, gnn_layer=1, att_layer=1, latdim=16,
                  num_heads=4, ssldim=8, pos_length=10)


@pytest.mark.parametrize("num_items,exclude", [(50, False), (53, True)])
def test_sharded_topk_matches_dense(num_items, exclude):
    """Raw sharded_topk vs dense scores@table.T + top_k, incl. a catalog
    that does NOT divide the shard count (pad rows must never win)."""
    mesh = make_mesh(data=1, model=8)
    rng = np.random.default_rng(3)
    B, D, k = 6, 16, 7
    q = rng.standard_normal((B, D)).astype(np.float32)
    table = rng.standard_normal((num_items, D)).astype(np.float32)
    seq = rng.integers(0, num_items, (B, 5)).astype(np.int32)
    msk = (rng.random((B, 5)) > 0.4).astype(np.float32)

    padded = shard_catalog(mesh, pad_catalog(table, 8))
    v, i = sharded_topk(mesh, jnp.asarray(q), padded, num_items, k,
                        seen_seq=jnp.asarray(seq) if exclude else None,
                        seen_mask=jnp.asarray(msk) if exclude else None)
    scores = q @ table.T
    if exclude:
        for b in range(B):
            scores[b, seq[b][msk[b] > 0]] = -np.inf
    want_v, _ = jax.lax.top_k(jnp.asarray(scores), k)
    np.testing.assert_allclose(np.asarray(v), np.asarray(want_v),
                               rtol=1e-5, atol=1e-5)
    # scores at the returned ids must equal the returned values
    np.testing.assert_allclose(
        np.take_along_axis(scores, np.asarray(i), axis=1), np.asarray(v),
        rtol=1e-5, atol=1e-5)
    assert int(np.asarray(i).max()) < num_items  # no pad row leaked


@pytest.mark.slow
def test_sharded_recommend_matches_single_device():
    """End-to-end: sharded_recommend_top_k == SelfGNN.recommend_top_k on
    the same params/graphs (8-way CPU mesh vs single device)."""
    U, I, B, k = 30, 50, 5, 8
    bundle = synthetic_dataset(num_users=U, num_items=I, graph_num=2,
                               seed=9)
    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=8)
    graphs = graphs_to_device(gb)
    model = SelfGNN(CFG, U, I)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    user_ids = jnp.asarray(rng.randint(0, U, B).astype(np.int32))
    seq = jnp.asarray(rng.randint(0, I, (B, 10)).astype(np.int32))
    mask = jnp.asarray((rng.rand(B, 10) > 0.4).astype(np.float32))

    for exclude in (False, True):
        want_v, want_i = model.recommend_top_k(
            params, graphs, user_ids, seq, mask, k=k, exclude_seen=exclude)

        mesh = make_mesh(data=1, model=8)
        final_user, final_item, _, _ = model.encode(params, graphs,
                                                    train=False)
        # pre-sharded table on one call, auto-built on the other
        table = shard_catalog(mesh, pad_catalog(np.asarray(final_item), 8))
        got_v, got_i = sharded_recommend_top_k(
            model, mesh, params, final_user, final_item, user_ids, seq,
            mask, k=k, exclude_seen=exclude,
            item_table=table if exclude else None)
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                                   rtol=1e-5, atol=1e-5)
        # ids may differ only at exact ties; verify scores at ids instead
        dense = np.array(model.score_all_items(
            params, final_user, final_item, user_ids, seq, mask))
        if exclude:
            sq, mk = np.asarray(seq), np.asarray(mask)
            for b in range(B):
                dense[b, sq[b][mk[b] > 0]] = -np.inf
        np.testing.assert_allclose(
            np.take_along_axis(dense, np.asarray(got_i), axis=1),
            np.asarray(got_v), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("num_items,exclude", [(50, False), (53, True),
                                               (117, True)])
def test_sharded_topk_chunked_matches_dense(num_items, exclude):
    """Sharded x streamed: per-shard chunked_topk streaming inside
    sharded_topk (chunk_rows>0) must equal the dense sharded path and the
    dense single-device reference — incl. non-divisible catalogs (global
    pad rows are a suffix of the LAST shard's slice; the traced per-shard
    real-row count masks them) and seen-exclusion crossing shards."""
    mesh = make_mesh(data=1, model=8)
    rng = np.random.default_rng(6)
    B, D, k = 5, 16, 6
    q = rng.standard_normal((B, D)).astype(np.float32)
    table = rng.standard_normal((num_items, D)).astype(np.float32)
    seq = rng.integers(0, num_items, (B, 5)).astype(np.int32)
    msk = (rng.random((B, 5)) > 0.4).astype(np.float32)

    padded = shard_catalog(mesh, pad_catalog(table, 8))
    scores = q @ table.T
    if exclude:
        for b in range(B):
            scores[b, seq[b][msk[b] > 0]] = -np.inf
    want_v, _ = jax.lax.top_k(jnp.asarray(scores), k)
    for chunk in (4, 7, 64):
        v, i = sharded_topk(
            mesh, jnp.asarray(q), padded, num_items, k,
            seen_seq=jnp.asarray(seq) if exclude else None,
            seen_mask=jnp.asarray(msk) if exclude else None,
            chunk_rows=chunk)
        np.testing.assert_allclose(np.asarray(v), np.asarray(want_v),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"chunk={chunk}")
        np.testing.assert_allclose(
            np.take_along_axis(scores, np.asarray(i), axis=1),
            np.asarray(v), rtol=1e-5, atol=1e-5)
        assert int(np.asarray(i).max()) < num_items


@pytest.mark.parametrize("chunk_rows", [-1, 16, 64])
def test_sharded_topk_empty_shards(chunk_rows):
    """Shards owning ZERO real rows (catalog < one shard's slice) must not
    leak pad/garbage winners. This happens when the table rows are padded
    beyond shard divisibility — e.g. node counts padded to shard multiples
    of 128 (parallel/sharding.py) with a tiny real catalog: at 8 shards x
    128 rows, shards 1-7 are all pad. Their candidates are -inf and must
    lose the global merge (guarded by the STATIC k <= num_items assert in
    sharded_topk; chunked_topk's per-shard num_items is traced and may be
    0 — see its k-guard note)."""
    mesh = make_mesh(data=1, model=8)
    rng = np.random.default_rng(11)
    B, D, k, num_items = 4, 16, 10, 37
    q = rng.standard_normal((B, D)).astype(np.float32)
    table = rng.standard_normal((num_items, D)).astype(np.float32)
    seq = rng.integers(0, num_items, (B, 5)).astype(np.int32)
    msk = (rng.random((B, 5)) > 0.4).astype(np.float32)

    # pad to 8 x 128 rows: only shard 0 has real rows (37 < 128)
    big = np.zeros((1024, D), np.float32)
    big[:num_items] = table
    padded = shard_catalog(mesh, big)

    scores = q @ table.T
    for b in range(B):
        scores[b, seq[b][msk[b] > 0]] = -np.inf
    want_v, _ = jax.lax.top_k(jnp.asarray(scores), k)

    v, i = sharded_topk(mesh, jnp.asarray(q), padded, num_items, k,
                        seen_seq=jnp.asarray(seq),
                        seen_mask=jnp.asarray(msk),
                        chunk_rows=chunk_rows)
    np.testing.assert_allclose(np.asarray(v), np.asarray(want_v),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.take_along_axis(scores, np.asarray(i), axis=1), np.asarray(v),
        rtol=1e-5, atol=1e-5)
    assert int(np.asarray(i).max()) < num_items
