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
    ndcg_all = 1.0 / jnp.log2(ranks.astype(jnp.float32) + 2.0)
    v = valid if valid is not None else jnp.ones_like(ndcg_all)
    out = {}
    for k in ks:
        hit = (ranks < k).astype(jnp.float32) * v
        out[f"HR@{k}"] = jnp.sum(hit)
        out[f"NDCG@{k}"] = jnp.sum(ndcg_all * hit)
    return out


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
