"""HR/NDCG must be bit-identical to the reference's sort-based algorithm
(model.py:484-510), including stable tie handling."""

import jax.numpy as jnp
import numpy as np

import jax

from sagnn_tpu.train.metrics import (full_sort_metrics, metrics_from_ranks,
                                     positive_ranks,
                                     streaming_positive_ranks, topk_metrics)
from tests.reference_oracle import hr_ndcg_reference


def _check(scores, cand, pos_items, ks=(1, 5, 10, 20)):
    B, C = scores.shape
    got = topk_metrics(jnp.asarray(scores), ks=ks)
    for k in ks:
        hit = ndcg = 0.0
        for b in range(B):
            h, n = hr_ndcg_reference(scores[b], cand[b], pos_items[b], k)
            hit += h
            ndcg += n
        np.testing.assert_allclose(float(got[f"HR@{k}"]), hit, atol=1e-6)
        np.testing.assert_allclose(float(got[f"NDCG@{k}"]), ndcg,
                                   rtol=1e-4, atol=1e-4)


def test_random_scores():
    rng = np.random.RandomState(0)
    B, C = 16, 30
    scores = rng.randn(B, C).astype(np.float32)
    cand = np.stack([rng.permutation(1000)[:C] for _ in range(B)])
    _check(scores, cand, cand[:, -1])


def test_ties_resolve_like_stable_sort():
    # equal scores: the positive (appended last) loses every tie, exactly as
    # Python's stable descending sort orders it after earlier candidates
    scores = np.array([[1.0, 1.0, 1.0, 1.0]], np.float32)
    cand = np.array([[7, 8, 9, 42]])
    ranks = positive_ranks(jnp.asarray(scores))
    assert int(ranks[0]) == 3
    _check(scores, cand, np.array([42]), ks=(1, 3, 4))


def test_positive_wins_strictly():
    scores = np.array([[0.1, 0.5, 0.2, 0.9]], np.float32)
    cand = np.array([[3, 5, 6, 11]])
    ranks = positive_ranks(jnp.asarray(scores))
    assert int(ranks[0]) == 0
    _check(scores, cand, np.array([11]), ks=(1,))


def test_valid_mask():
    scores = np.array([[0.1, 0.9], [0.9, 0.1]], np.float32)
    got = topk_metrics(jnp.asarray(scores), ks=(1,),
                       valid=jnp.asarray([1.0, 0.0]))
    assert float(got["HR@1"]) == 1.0  # second row masked out


def test_full_sort_matches_brute_force():
    rng = np.random.RandomState(3)
    B, I = 8, 50
    scores = rng.randn(B, I).astype(np.float32)
    pos = rng.randint(0, I, B)
    # exclude ~20% of items per row, never the positive
    excl = rng.rand(B, I) < 0.2
    excl[np.arange(B), pos] = False
    masked = np.where(excl, -np.inf, scores)
    got = full_sort_metrics(jnp.asarray(masked), jnp.asarray(pos),
                            ks=(1, 5, 10))
    for k in (1, 5, 10):
        hit = ndcg = 0.0
        for b in range(B):
            # reference tie rule: equal scores rank ahead of the positive
            rank = int(np.sum(masked[b] >= masked[b, pos[b]]) - 1)
            if rank < k:
                hit += 1.0
                ndcg += 1.0 / np.log2(rank + 2)
        np.testing.assert_allclose(float(got[f"HR@{k}"]), hit, atol=1e-6)
        np.testing.assert_allclose(float(got[f"NDCG@{k}"]), ndcg, rtol=1e-5)


def test_streaming_ranks_match_dense_full_sort():
    """streaming_positive_ranks == the dense [B, I] full-sort rank, across
    exclusions, a catalog that does not divide the chunk size, AND exact
    score ties (duplicated encoding rows — cold items after propagation
    share identical embeddings, so the tie path is real)."""
    rng = np.random.RandomState(11)
    B, I, D, K = 12, 103, 16, 8
    table = rng.randn(I, D).astype(np.float32)
    # duplicate blocks: items 0..9 identical to items 50..59
    table[50:60] = table[0:10]
    queries = rng.randn(B, D).astype(np.float32)
    pos = rng.randint(0, I, B).astype(np.int32)
    pos[:4] = np.arange(4)  # positives inside the duplicated block
    excl = np.full((B, K), I, np.int32)
    for b in range(B):
        cands = rng.permutation(I)[:rng.randint(0, K)]
        cands = cands[cands != pos[b]]
        excl[b, :len(cands)] = cands
    # exclude a duplicate-of-positive for some rows (score tie + exclusion)
    excl[0, K - 1] = pos[0] + 50

    scores = queries @ table.T
    rows = np.arange(B)[:, None]
    masked = scores.copy()
    for b in range(B):
        masked[b, excl[b][excl[b] < I]] = -np.inf
    dense = full_sort_metrics(jnp.asarray(masked), jnp.asarray(pos),
                              ks=(1, 5, 10))
    for chunk in (16, 50, 103, 256):
        ranks = streaming_positive_ranks(
            jnp.asarray(queries), jnp.asarray(table), jnp.asarray(pos),
            jnp.asarray(excl), I, chunk_items=chunk)
        got = metrics_from_ranks(ranks, ks=(1, 5, 10))
        for k in (1, 5, 10):
            np.testing.assert_allclose(float(got[f"HR@{k}"]),
                                       float(dense[f"HR@{k}"]), atol=1e-6,
                                       err_msg=f"chunk={chunk} k={k}")
            np.testing.assert_allclose(float(got[f"NDCG@{k}"]),
                                       float(dense[f"NDCG@{k}"]), rtol=1e-5,
                                       err_msg=f"chunk={chunk} k={k}")


def test_full_sort_agrees_with_candidate_protocol_on_full_catalog():
    """With no exclusions and the candidate set = the whole catalog, the two
    protocols produce identical sums (same tie rule)."""
    rng = np.random.RandomState(4)
    B, I = 6, 40
    scores = rng.randn(B, I).astype(np.float32)
    pos = rng.randint(0, I, B)
    full = full_sort_metrics(jnp.asarray(scores), jnp.asarray(pos),
                             ks=(5, 10))
    # candidate layout: all non-positives then the positive LAST
    cand_scores = np.zeros((B, I), np.float32)
    for b in range(B):
        others = np.delete(scores[b], pos[b])
        cand_scores[b] = np.concatenate([others, [scores[b, pos[b]]]])
    cand = topk_metrics(jnp.asarray(cand_scores), ks=(5, 10))
    for k in (5, 10):
        np.testing.assert_allclose(float(full[f"HR@{k}"]),
                                   float(cand[f"HR@{k}"]), atol=1e-6)
        np.testing.assert_allclose(float(full[f"NDCG@{k}"]),
                                   float(cand[f"NDCG@{k}"]), rtol=1e-5)
