"""Serving-path test: full-catalog top-k recommendation."""

import jax
import jax.numpy as jnp
import numpy as np

from sagnn_tpu.config import ModelConfig
from sagnn_tpu.data.graph import compile_interval_graphs
from sagnn_tpu.data.synthetic import synthetic_dataset
from sagnn_tpu.models.selfgnn import SelfGNN
from sagnn_tpu.train.trainer import graphs_to_device

CFG = ModelConfig(graph_num=2, gnn_layer=1, att_layer=1, latdim=16,
                  num_heads=4, ssldim=8, pos_length=10)


def test_top_k_consistent_with_scores():
    bundle = synthetic_dataset(num_users=30, num_items=50, graph_num=2,
                               seed=9)
    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=8)
    graphs = graphs_to_device(gb)
    model = SelfGNN(CFG, 30, 50)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    B = 5
    user_ids = jnp.asarray(rng.randint(0, 30, B).astype(np.int32))
    seq = jnp.asarray(rng.randint(0, 50, (B, 10)).astype(np.int32))
    mask = jnp.asarray((rng.rand(B, 10) > 0.4).astype(np.float32))

    scores_k, items_k = model.recommend_top_k(params, graphs, user_ids,
                                              seq, mask, k=8,
                                              exclude_seen=False)
    assert scores_k.shape == (B, 8) and items_k.shape == (B, 8)
    # must agree with exhaustive candidate scoring
    all_items = jnp.broadcast_to(jnp.arange(50)[None], (B, 50))
    full = model.score_candidates(params, graphs, user_ids, all_items, seq,
                                  mask)
    expect = np.sort(np.asarray(full), axis=1)[:, ::-1][:, :8]
    np.testing.assert_allclose(np.sort(np.asarray(scores_k))[:, ::-1],
                               expect, rtol=1e-4, atol=1e-4)


def test_top_k_excludes_seen():
    bundle = synthetic_dataset(num_users=20, num_items=30, graph_num=2,
                               seed=10)
    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=8)
    graphs = graphs_to_device(gb)
    model = SelfGNN(CFG, 20, 30)
    params = model.init(jax.random.PRNGKey(1))
    B = 4
    user_ids = jnp.asarray(np.arange(B, dtype=np.int32))
    seq = np.zeros((B, 10), np.int32)
    mask = np.zeros((B, 10), np.float32)
    for b in range(B):
        items = bundle.sequences[b][:5]
        seq[b, -len(items):] = items
        mask[b, -len(items):] = 1
    _, items_k = model.recommend_top_k(params, graphs, user_ids,
                                       jnp.asarray(seq), jnp.asarray(mask),
                                       k=10, exclude_seen=True)
    got = np.asarray(items_k)
    for b in range(B):
        seen = set(np.asarray(seq[b])[np.asarray(mask[b]) > 0].tolist())
        assert not seen & set(got[b].tolist())


def test_chunked_topk_matches_dense():
    """chunked_topk (the 1M-item-scale streaming serving path) must return
    the same winners as dense score + topk_descending — across chunk sizes
    that do and don't divide the catalog, with and without seen-exclusion."""
    from sagnn_tpu.models.selfgnn import chunked_topk, topk_descending

    rng = np.random.default_rng(3)
    B, I, D, L, k = 8, 333, 16, 12, 10
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    tbl = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))
    seen_seq = jnp.asarray(rng.integers(0, I, (B, L)).astype(np.int32))
    seen_mask = jnp.asarray((rng.random((B, L)) < 0.7).astype(np.float32))

    dense = np.asarray(q @ tbl.T)
    for use_seen in (False, True):
        s = dense.copy()
        if use_seen:
            for b in range(B):
                s[b, np.asarray(seen_seq[b])[np.asarray(seen_mask[b]) > 0]] \
                    = -np.inf
        want_v, _ = topk_descending(jnp.asarray(s), k)
        for chunk in (64, 100, 333, 512):
            got_v, got_i = chunked_topk(
                q, tbl, I, k, chunk_rows=chunk,
                seen_seq=seen_seq if use_seen else None,
                seen_mask=seen_mask if use_seen else None)
            np.testing.assert_allclose(np.asarray(got_v),
                                       np.asarray(want_v), rtol=1e-5,
                                       err_msg=f"chunk={chunk} "
                                               f"seen={use_seen}")
            # returned ids must reproduce the returned scores
            np.testing.assert_allclose(
                np.take_along_axis(s, np.asarray(got_i), axis=1),
                np.asarray(got_v), rtol=1e-5)


def test_chunked_topk_bf16_rerank():
    """score_dtype=bf16: winner selection from the bf16 stream, returned
    scores EXACT f32 (reranked). On well-separated random data the
    selected set matches the exact path."""
    from sagnn_tpu.models.selfgnn import chunked_topk, topk_descending

    rng = np.random.default_rng(7)
    B, I, D, k = 8, 500, 32, 10
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    tbl = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))
    dense = np.asarray(q @ tbl.T)
    want_v, _ = topk_descending(jnp.asarray(dense), k)
    got_v, got_i = chunked_topk(q, tbl, I, k, chunk_rows=128,
                                score_dtype=jnp.bfloat16)
    assert got_v.dtype == jnp.float32
    # returned scores must be the EXACT f32 scores of the returned ids
    np.testing.assert_allclose(
        np.take_along_axis(dense, np.asarray(got_i), axis=1),
        np.asarray(got_v), rtol=1e-6)
    # selection may differ from exact only within bf16 resolution: every
    # returned score must be >= the exact k-th score minus the bf16
    # quantization bound at that magnitude (2^-8 relative)
    wv = np.asarray(want_v)
    tol = np.abs(wv) * 2.0 ** -8 + 1e-6
    assert np.all(np.asarray(got_v) >= wv - tol)


def test_recommend_top_k_chunked_matches_dense():
    """SelfGNN.recommend_top_k(chunk_rows>0) == the dense path end-to-end."""
    bundle = synthetic_dataset(num_users=20, num_items=64, graph_num=2,
                               seed=12)
    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=8)
    graphs = graphs_to_device(gb)
    model = SelfGNN(CFG, 20, 64)
    params = model.init(jax.random.PRNGKey(2))
    rng = np.random.RandomState(5)
    B = 6
    user_ids = jnp.asarray(rng.randint(0, 20, B).astype(np.int32))
    seq = jnp.asarray(rng.randint(0, 64, (B, 10)).astype(np.int32))
    mask = jnp.asarray((rng.rand(B, 10) > 0.4).astype(np.float32))
    for exclude in (False, True):
        want_v, want_i = model.recommend_top_k(
            params, graphs, user_ids, seq, mask, k=7, exclude_seen=exclude,
            chunk_rows=-1)
        got_v, got_i = model.recommend_top_k(
            params, graphs, user_ids, seq, mask, k=7, exclude_seen=exclude,
            chunk_rows=24)
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                                   rtol=1e-5, atol=1e-6)


def test_topk_descending_exact():
    """topk_descending(recall_target=1.0) must equal lax.top_k exactly —
    same values in descending order — including -inf-masked columns (the
    exclude_seen path) and duplicate scores."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sagnn_tpu.models.selfgnn import topk_descending

    rng = np.random.default_rng(0)
    s = rng.standard_normal((64, 5000)).astype(np.float32)
    s[rng.random(s.shape) < 0.1] = -np.inf      # masked "seen" items
    s[:, 100] = s[:, 200]                        # forced ties
    got_v, got_i = topk_descending(jnp.asarray(s), 10)
    want_v, want_i = jax.lax.top_k(jnp.asarray(s), 10)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    # indices may differ only where values tie; scores at indices must match
    np.testing.assert_array_equal(
        np.take_along_axis(s, np.asarray(got_i), axis=1),
        np.asarray(want_v))
