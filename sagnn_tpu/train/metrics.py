"""Ranking metrics: HR@K / NDCG@K (ref: model.py:484-510 `calcRes`).

The reference sorts (score, item) pairs per user with Python's STABLE
descending sort and takes the top K. The positive candidate is appended LAST
(model.py:404), so under a stable sort every candidate with a strictly
greater score — and every EQUAL-score candidate, being earlier in the input —
ranks ahead of it. Hence:

    rank(pos) = #{j < C-1 : s_j >= s_pos}
    hit@K  = rank < K
    ndcg@K = 1/log2(rank+2) if hit else 0

computed batched on device below, bit-identical to the reference's
sort-based algorithm.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def positive_ranks(scores: jnp.ndarray) -> jnp.ndarray:
    """scores: [B, C] with the positive at column C-1 -> int32 ranks [B]."""
    pos = scores[:, -1:]
    others = scores[:, :-1]
    return jnp.sum(others >= pos, axis=1).astype(jnp.int32)


def topk_metrics(scores: jnp.ndarray, ks=(1, 5, 10, 15, 20),
                 valid: jnp.ndarray | None = None) -> Dict[str, jnp.ndarray]:
    """Summed HR/NDCG per K over the batch (caller divides by user count,
    as the reference accumulates sums then divides, model.py:466-479)."""
    ranks = positive_ranks(scores)
    ndcg_all = 1.0 / jnp.log2(ranks.astype(jnp.float32) + 2.0)
    v = valid if valid is not None else jnp.ones_like(ndcg_all)
    out = {}
    for k in ks:
        hit = (ranks < k).astype(jnp.float32) * v
        out[f"HR@{k}"] = jnp.sum(hit)
        out[f"NDCG@{k}"] = jnp.sum(ndcg_all * hit)
    return out


def metrics_from_ranks(ranks: jnp.ndarray,
                       valid: jnp.ndarray | None = None,
                       ks=(1, 5, 10, 15, 20)) -> Dict[str, jnp.ndarray]:
    """Summed HR/NDCG per K from precomputed positive ranks [B] — the
    shared tail of every ranking protocol (candidate, full-sort dense,
    full-sort streaming): hit@K = rank < K, ndcg@K = 1/log2(rank+2)."""
    ndcg_all = 1.0 / jnp.log2(ranks.astype(jnp.float32) + 2.0)
    v = valid if valid is not None else jnp.ones_like(ndcg_all)
    out = {}
    for k in ks:
        hit = (ranks < k).astype(jnp.float32) * v
        out[f"HR@{k}"] = jnp.sum(hit)
        out[f"NDCG@{k}"] = jnp.sum(ndcg_all * hit)
    return out


def full_sort_metrics(scores: jnp.ndarray, pos_items: jnp.ndarray,
                      valid: jnp.ndarray | None = None,
                      ks=(1, 5, 10, 15, 20)) -> Dict[str, jnp.ndarray]:
    """Summed HR/NDCG per K for FULL-CATALOG ranking (no reference analog).

    scores: [B, num_items] with excluded items already set to -inf;
    pos_items: [B] the positive item id per row. The tie rule matches
    `positive_ranks` (equal scores rank ahead of the positive), so the two
    protocols agree on any shared candidate set.
    """
    s_pos = jnp.take_along_axis(scores, pos_items[:, None].astype(jnp.int32),
                                axis=1)                       # [B, 1]
    # >= counts the positive itself once — subtract it back out
    ranks = (jnp.sum(scores >= s_pos, axis=1) - 1).astype(jnp.int32)
    return metrics_from_ranks(ranks, valid=valid, ks=ks)


def streaming_positive_ranks(queries: jnp.ndarray, item_table: jnp.ndarray,
                             pos_items: jnp.ndarray, excl_idx: jnp.ndarray,
                             num_items: int,
                             chunk_items: int = 65_536) -> jnp.ndarray:
    """Full-catalog positive ranks WITHOUT materializing [B, num_items].

    The rank is all the metrics need: rank(pos) = #{catalog items j not
    excluded, j != pos : s_j >= s_pos}. A lax.scan walks catalog chunks
    accumulating count(q @ chunk^T >= s_pos) with this chunk's excluded
    columns (scattered from excl_idx, the same per-shard decomposition
    sharded_topk uses) and the positive's own column masked out — peak
    memory is O(B * chunk_items) instead of O(B * num_items).

    queries    [B, D]   per-user head vectors (SelfGNN.serving_queries)
    item_table [I, D]   catalog encodings (final_item)
    pos_items  [B]      positive item id per row
    excl_idx   [B, K]   per-user excluded item ids, pad = num_items
                        (never contains the positive — Sampler contract)

    Tie-exact vs the dense full_sort_metrics rank: s_pos is EXTRACTED from
    the same chunk matmuls the counts compare against (a first scan pass
    picks the positive's own matmul element), so an exactly-equal item row
    compares equal here too — a separately-computed dot can differ by
    1 ulp and flip a >= tie. The matmul runs twice; at D=64 it is stream-
    bound and a small fraction of the eval epoch, a fair price for a
    bitwise-identical protocol. Exclusion masks columns by ID before
    counting, exactly like the dense path's -inf scatter.
    """
    B, D = queries.shape
    I = item_table.shape[0]
    n_chunks = -(-I // chunk_items)
    Ipad = n_chunks * chunk_items
    tbl = item_table
    if Ipad != I:
        tbl = jnp.pad(item_table, ((0, Ipad - I), (0, 0)))
    tbl = tbl.reshape(n_chunks, chunk_items, D)
    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk_items

    def extract(s_pos, xs):
        # pass 1: pull s_pos out of the chunk that owns the positive
        chunk, gid0 = xs
        s = queries @ chunk.T                                 # [B, chunk]
        loc = pos_items - gid0
        in_range = (loc >= 0) & (loc < chunk_items)
        val = jnp.take_along_axis(
            s, jnp.clip(loc, 0, chunk_items - 1)[:, None], axis=1)[:, 0]
        return jnp.where(in_range, val, s_pos), None

    s_pos, _ = jax.lax.scan(extract, jnp.full(B, -jnp.inf), (tbl, starts))

    def body(acc, xs):
        chunk, gid0 = xs
        s = queries @ chunk.T                                 # [B, chunk]
        gids = gid0 + jnp.arange(chunk_items)
        keep = (gids[None, :] < num_items) \
            & (gids[None, :] != pos_items[:, None])
        # this chunk's excluded columns (negative-offset wrap handled by
        # the shared helper)
        from sagnn_tpu.ops.chunking import scatter_local_mask
        excluded = scatter_local_mask(excl_idx, gid0, chunk_items)
        cnt = jnp.sum((s >= s_pos[:, None]) & keep & ~excluded, axis=1)
        return acc + cnt.astype(jnp.int32), None

    total, _ = jax.lax.scan(body, jnp.zeros(B, jnp.int32), (tbl, starts))
    return total


@dataclass
class MetricsHistory:
    """Per-epoch metric lists (ref: model.py:24-28 self.metrics)."""

    data: Dict[str, List[float]] = field(default_factory=lambda: {
        f"{phase}{met}": []
        for phase in ("Train", "Test")
        for met in ("Loss", "preLoss", "HR", "NDCG")
    })

    def append(self, phase: str, values: Dict[str, float]) -> None:
        for met, val in values.items():
            key = phase + met
            if key in self.data:
                self.data[key].append(float(val))

    def format_line(self, name: str, ep: int, total_ep: int,
                    values: Dict[str, float]) -> str:
        """ref makePrint (model.py:30-39)."""
        ret = f"Epoch {ep}/{total_ep}, {name}: "
        ret += ", ".join(f"{m} = {v:.4f}" for m, v in values.items())
        return ret + "  "

    @property
    def num_tests(self) -> int:
        return len(self.data["TestHR"])


def as_numpy(metrics: Dict[str, jnp.ndarray]) -> Dict[str, float]:
    return {k: float(np.asarray(v)) for k, v in metrics.items()}
