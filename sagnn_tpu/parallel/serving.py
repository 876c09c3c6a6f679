"""Catalog-sharded serving: distributed full-catalog top-k retrieval.

The single-chip serving path (SelfGNN.recommend_top_k) scores a user batch
against the whole item catalog and runs approx_max_k — fine at 41k items,
but a production catalog (config-5 scale: ~1M items) wants the item
encodings sharded over the mesh. This module provides the classic
distributed-MIPS decomposition on the 'model' axis:

  per shard:  scores = queries @ item_shard.T          [B, I/P]  (MXU)
              local (vals, ids) = approx_max_k(scores) [B, k]
  merge:      all_gather the per-shard winners over ICI -> [B, P*k]
              exact top_k of the P*k candidates        [B, k]

The merge is exact for recall_target=1.0: the global top-k is a subset of
the per-shard top-ks. Communication is O(P*B*k) — independent of catalog
size — so the exchange rides ICI at negligible cost next to the [B, I/P]
matmul.

No reference analog (the reference only ranks 1000 precomputed candidates,
model.py:430-482); this is the scale-out of the serving surface introduced
in round 1 (scripts/recommend.py, scripts/bench_serving.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pad_catalog(table: np.ndarray, num_shards: int) -> np.ndarray:
    """Pad item-encoding rows so the catalog splits evenly over shards.

    Pad rows are masked to -inf score inside the shard kernel (never by
    value), so zero-padding is safe.
    """
    n = table.shape[0]
    target = -(-n // num_shards) * num_shards
    if target == n:
        return table
    return np.concatenate(
        [table, np.zeros((target - n,) + table.shape[1:], table.dtype)])


def shard_catalog(mesh: Mesh, table, axis: str = "model"):
    """Device_put a (padded) catalog with rows sharded over `axis`."""
    return jax.device_put(table, NamedSharding(mesh, P(axis, None)))


def sharded_topk(mesh: Mesh, queries: jnp.ndarray, item_table: jnp.ndarray,
                 num_items: int, k: int, recall_target: float = 1.0,
                 seen_seq: Optional[jnp.ndarray] = None,
                 seen_mask: Optional[jnp.ndarray] = None,
                 axis: str = "model",
                 chunk_rows: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k item ids for each query row over a sharded catalog.

    queries    [B, D]  replicated (the per-user head vector pu + au)
    item_table [Ip, D] rows sharded over `axis`; Ip = padded catalog size,
               divisible by the axis size (pad_catalog)
    num_items  real catalog size (pad rows gid >= num_items are masked)
    seen_seq/seen_mask [B, L]: optional per-user already-seen item ids to
               exclude (the exclude_seen semantics of recommend_top_k)
    chunk_rows: 0 = auto (dense per-shard scoring up to 131,072 local
               rows, models.selfgnn.chunked_topk streaming past it); -1 =
               force dense; >0 = stream each shard's slice in chunks of
               this many rows. Sharded x streamed composes: an 8-chip
               mesh serves an 8M-item catalog with the same per-chip
               memory bound a 1M-item catalog needs on one chip.

    Returns (scores [B, k], item_ids [B, k]) descending, replicated.
    """
    n_shards = mesh.shape[axis]
    rows = item_table.shape[0]
    assert rows % n_shards == 0, (rows, n_shards)
    # guard against the REAL catalog size, not the padded row count: pad
    # rows score -inf with ids >= num_items, which would index out of
    # bounds downstream if k exceeded the true catalog
    assert k <= num_items, (k, num_items)
    local_rows = rows // n_shards
    if chunk_rows == 0:
        from sagnn_tpu.ops.chunking import auto_chunk_rows
        chunk_rows = auto_chunk_rows(local_rows)
    # a shard can contribute at most local_rows global winners, so the
    # merge stays exact with the per-shard k clamped (tiny catalogs)
    k_local = min(k, local_rows)
    exclude = seen_seq is not None

    def shard_fn(q, tbl, seq, msk):
        # tbl: [local_rows, D] — this shard's slice of the catalog
        p = jax.lax.axis_index(axis)
        gid0 = p * local_rows
        if chunk_rows > 0:
            # stream this shard's slice: chunked_topk works in LOCAL ids
            # (seen ids shift by gid0; its in-chunk range masks drop the
            # ones belonging to other shards). Global pad rows are a
            # SUFFIX of this shard's slice (pad_catalog appends), so the
            # shard's real-row count is a valid — traced — num_items
            from sagnn_tpu.models.selfgnn import chunked_topk
            local_real = jnp.clip(num_items - gid0, 0, local_rows)
            v, i = chunked_topk(
                q, tbl, local_real, k_local, chunk_rows=chunk_rows,
                recall_target=recall_target,
                seen_seq=None if not exclude else seq - gid0,
                seen_mask=msk if exclude else None)
        else:
            scores = q @ tbl.T                              # [B, local]
            gids = gid0 + jnp.arange(local_rows)
            scores = jnp.where(gids[None, :] < num_items, scores, -jnp.inf)
            if exclude:
                from sagnn_tpu.ops.chunking import scatter_local_mask
                seen = scatter_local_mask(seq, gid0, local_rows, valid=msk)
                scores = jnp.where(seen, -jnp.inf, scores)
            v, i = jax.lax.approx_max_k(scores, k_local,
                                        recall_target=recall_target)
        gi = gid0 + i
        # winners exchange: O(P*B*k), catalog-size independent
        av = jax.lax.all_gather(v, axis)                    # [P, B, k]
        ai = jax.lax.all_gather(gi, axis)
        B = q.shape[0]
        av = jnp.moveaxis(av, 0, 1).reshape(B, -1)          # [B, P*k]
        ai = jnp.moveaxis(ai, 0, 1).reshape(B, -1)
        fv, order = jax.lax.top_k(av, k)                    # exact merge
        fi = jnp.take_along_axis(ai, order, axis=-1)
        return fv, fi

    if not exclude:
        # fixed arity for shard_map: feed dummy [B, 1] exclusion inputs
        seen_seq = jnp.zeros((queries.shape[0], 1), jnp.int32)
        seen_mask = jnp.zeros((queries.shape[0], 1), jnp.float32)

    # queries/masks may arrive from the encode device (single-device
    # sharding); replicate them onto the serving mesh so every operand
    # commits to the same device set
    rep = NamedSharding(mesh, P())
    queries = jax.device_put(queries, rep)
    seen_seq = jax.device_put(seen_seq, rep)
    seen_mask = jax.device_put(seen_mask, rep)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(axis, None), P(), P()),
        out_specs=(P(), P()),
        # all_gather makes the outputs replicated over `axis`; the vma
        # checker cannot always prove it through approx_max_k
        check_rep=False,
    )
    return fn(queries, item_table, seen_seq, seen_mask)


def sharded_recommend_top_k(model, mesh: Mesh, params, final_user,
                            final_item, user_ids: jnp.ndarray,
                            seq: jnp.ndarray, seq_mask: jnp.ndarray,
                            k: int = 10, exclude_seen: bool = True,
                            recall_target: float = 1.0,
                            axis: str = "model", item_table=None,
                            chunk_rows: int = 0
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Serving facade over a sharded catalog.

    Mirrors SelfGNN.recommend_top_k (the two-term head of
    /root/reference/model.py:169-173 expanded over every item) but runs
    the catalog side sharded over the mesh, so item sets far past one
    chip's HBM serve at full rate.

    The query side (sequence branch token lookups + final_user row) runs
    on the encode device with the unsharded `final_item`; only the [B, D]
    queries cross to the serving mesh. Pass a pre-sharded `item_table`
    (pad_catalog + shard_catalog) to reuse it across request batches —
    otherwise it is built here from `final_item` per call.
    """
    queries = model.serving_queries(params, final_user, final_item,
                                    user_ids, seq, seq_mask)
    num_items = final_item.shape[0]
    if item_table is None:
        item_table = shard_catalog(
            mesh, pad_catalog(np.asarray(final_item), mesh.shape[axis]),
            axis)
    return sharded_topk(mesh, queries, item_table, num_items, k,
                        recall_target,
                        seen_seq=seq if exclude_seen else None,
                        seen_mask=seq_mask if exclude_seen else None,
                        axis=axis, chunk_rows=chunk_rows)
