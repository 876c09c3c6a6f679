"""SelfGNN: the full model as pure init/apply functions.

Re-design of the reference forward graph (model.py:104-205 `Recommender.ours`)
for TPU/XLA: one jitted function, static shapes everywhere, `lax.scan` over
the interval axis, padded edge blocks for propagation, masked padded batches
for the ragged sampled ids.

Parameter registry split (determines the L2 regularizer, ref
NNLayers.Regularize over regParams):
  params["reg"]   — u_embed, i_embed, pos_embed, time_embed, time_fc (the
                    per-propagation throwaway FC weights, SURVEY.md Q6),
                    meta2_w, meta3_w — exactly the reference's regParams set.
  params["free"]  — LSTM, the MHSA dense kernels/biases (built with
                    tf.layers.dense → never registered), all layer norms,
                    meta biases.

Behavioral quirks replicated (SURVEY.md §7.0): Q1/Q2 unweighted propagation
(no edge dropout, no normalization), Q3 pooled sequence branch, Q4 shared
user/item LSTM, Q5 exp-attention, Q6 throwaway FC weights feeding only the
regularizer.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sagnn_tpu.config import ModelConfig
from sagnn_tpu.models.layers import tf_glorot_uniform, leaky_relu, l2_sum
from sagnn_tpu.ops.attention import (
    init_layer_norm_params, init_mhsa_params, layer_norm,
    multi_head_self_attention,
)
from sagnn_tpu.ops.lstm import init_lstm_params, lstm_scan
from sagnn_tpu.ops.segment import propagate


# ---------------------------------------------------------------------------
# Batch containers (all fixed-shape, mask-padded)
# ---------------------------------------------------------------------------

@dataclass
class TrainBatch:
    """One training step's host-sampled inputs (ref model.py:252-339).

    P = batch * samp_num BPR pairs; Pssl = batch * ssl_num SSL pairs.
    The reference's ragged feeds become padded arrays + masks.
    """

    uids: jnp.ndarray        # [P] user id per BPR pair
    pos_iids: jnp.ndarray    # [P] positive item
    neg_iids: jnp.ndarray    # [P] negative item
    useq_row: jnp.ndarray    # [P] row into seq/seq_mask for this pair's user
    pair_mask: jnp.ndarray   # [P] 1.0 for real pairs
    seq: jnp.ndarray         # [B, L] right-aligned item sequence (pad 0)
    seq_mask: jnp.ndarray    # [B, L]
    # SSL pairs, reference layout split in half (see sampler): the reference
    # interleaves entries then pairs element j with element j + len/2
    # (model.py:186-202); the sampler performs that split on the host so the
    # device sees aligned (A, B) pairs.
    ssl_u_a: jnp.ndarray     # [g, Pssl]
    ssl_i_a: jnp.ndarray     # [g, Pssl]
    ssl_u_b: jnp.ndarray     # [g, Pssl]
    ssl_i_b: jnp.ndarray     # [g, Pssl]
    ssl_mask: jnp.ndarray    # [g, Pssl]


jax.tree_util.register_pytree_node(
    TrainBatch,
    lambda b: ((b.uids, b.pos_iids, b.neg_iids, b.useq_row, b.pair_mask,
                b.seq, b.seq_mask, b.ssl_u_a, b.ssl_i_a, b.ssl_u_b,
                b.ssl_i_b, b.ssl_mask), None),
    lambda _, c: TrainBatch(*c),
)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_params(key: jax.Array, cfg: ModelConfig, num_users: int,
                num_items: int, max_time: int = 1) -> Dict:
    ks = iter(jax.random.split(key, 64))
    g, D = cfg.graph_num, cfg.latdim
    n_prop = g * cfg.gnn_layer * 2  # one throwaway FC per messagePropagate call

    reg = {
        # model.py:108-117
        "u_embed": tf_glorot_uniform(next(ks), (g, num_users, D)),
        "i_embed": tf_glorot_uniform(next(ks), (g, num_items, D)),
        "pos_embed": tf_glorot_uniform(next(ks), (cfg.pos_length, D)),
        "time_embed": tf_glorot_uniform(next(ks), (max_time + 1, D)),
        # Q6: FC(self.timeEmbed, latdim) weight created per propagate call
        # (model.py:81); output unused, weight only feeds the L2 term.
        "time_fc": tf_glorot_uniform(next(ks), (n_prop, D, D)),
        # meta network weights (model.py:180-182, FC reg=True)
        "meta2_w": tf_glorot_uniform(next(ks), (3 * D, cfg.ssldim)),
        "meta3_w": tf_glorot_uniform(next(ks), (cfg.ssldim, 1)),
    }
    free = {
        "lstm": init_lstm_params(next(ks), D),  # shared user/item cell (Q4)
        "mhsa_user": init_mhsa_params(next(ks), D),
        "mhsa_item": init_mhsa_params(next(ks), D),
        "ln_user": init_layer_norm_params(D),
        "ln_item": init_layer_norm_params(D),
        "seq_ln_item": init_layer_norm_params(D),
        "seq_ln_pos": init_layer_norm_params(D),
        "seq_mhsa": [init_mhsa_params(next(ks), D)
                     for _ in range(cfg.att_layer)],
        "seq_ln": [init_layer_norm_params(D) for _ in range(cfg.att_layer)],
        "meta2_b": jnp.zeros((cfg.ssldim,)),
        "meta3_b": jnp.zeros((1,)),
    }
    return {"reg": reg, "free": free}


def reg_loss(params: Dict) -> jax.Array:
    """args.reg * this = the weight-decay part of regLoss (model.py:245)."""
    return l2_sum(params["reg"])


def topk_descending(scores: jnp.ndarray, k: int,
                    recall_target: float = 1.0
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k over the last axis, descending, via approx_max_k.

    lax.top_k lowers to a full sort on TPU (16 ms on [256, 41k] f32);
    approx_max_k uses the TPU's optimized partial-reduction path (4.4 ms
    at recall_target=1.0, which is exact; 1.8 ms at 0.95). approx_max_k
    leaves the k winners only approximately ordered, so the k-wide result
    is re-sorted with a (trivial) exact top_k.
    """
    vals, idx = jax.lax.approx_max_k(scores, k, recall_target=recall_target)
    vals, order = jax.lax.top_k(vals, k)
    return vals, jnp.take_along_axis(idx, order, axis=-1)


def chunked_topk(queries: jnp.ndarray, item_table: jnp.ndarray,
                 num_items: int, k: int, chunk_rows: int = 65_536,
                 recall_target: float = 1.0,
                 seen_seq: Optional[jnp.ndarray] = None,
                 seen_mask: Optional[jnp.ndarray] = None,
                 score_dtype: Optional[jnp.dtype] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-device streaming top-k over a catalog too big to score densely.

    The per-shard decomposition of parallel.serving.sharded_topk run as a
    lax.scan over catalog chunks on ONE device: each step scores
    [B, chunk_rows] on the MXU, approx_max_k's the chunk, and folds the
    winners into a running top-k via an exact [B, 2k] merge — peak memory
    O(B * chunk_rows) instead of the [B, num_items] score matrix
    (1 GB per 256-user batch at 1M items f32). Exact at
    recall_target=1.0: the global top-k is a subset of per-chunk top-ks.

    queries [B, D]; item_table [I, D] (rows past num_items are pad);
    seen_seq/seen_mask [B, L]: optional per-user already-seen ids to
    exclude (recommend_top_k's exclude_seen, applied per chunk by local
    column scatter — never as a dense [B, num_items] mask).

    score_dtype=jnp.bfloat16 selects winners from a bf16 score stream
    (halves the dominant HBM cost: the [B, chunk] score write + the
    approx_max_k read-back) and then RESCORES the O(k) winners in f32 —
    the classic quantized-retrieval + exact-rerank split. Returned scores
    are exact f32; selection can differ from exact only where two items'
    true scores agree within bf16 resolution (~3 decimal digits).
    Returns (scores [B, k], item_ids [B, k]) descending.
    """
    B, D = queries.shape
    I = item_table.shape[0]
    if isinstance(num_items, int):
        # a traced num_items is legal (sharded_topk passes the shard's
        # real-row count, data-dependent on the shard index) — it is only
        # ever used in elementwise comparisons below. The k-guard cannot
        # fire then, and MUST NOT need to: a traced num_items may even be
        # 0 (a shard owning only pad rows — tables padded to shard
        # multiples of 128 with a small catalog). Every candidate of such
        # a call scores -inf, which is correct AS LONG AS the caller
        # guarantees k real candidates exist globally — sharded_topk's
        # static `k <= num_items` assert on the true catalog size does
        # exactly that, and its merge drops the -inf losers
        # (test_sharded_topk_empty_shards).
        assert k <= num_items, (k, num_items)
    n_chunks = -(-I // chunk_rows)
    Ipad = n_chunks * chunk_rows
    tbl = item_table
    if Ipad != I:
        tbl = jnp.pad(item_table, ((0, Ipad - I), (0, 0)))
    tbl = tbl.reshape(n_chunks, chunk_rows, D)
    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk_rows
    k_local = min(k, chunk_rows)
    exclude = seen_seq is not None
    q_s = queries if score_dtype is None else queries.astype(score_dtype)

    def body(carry, xs):
        best_v, best_i = carry
        chunk, gid0 = xs
        if score_dtype is not None:
            chunk = chunk.astype(score_dtype)
        scores = jax.lax.dot_general(
            q_s, chunk, (((1,), (1,)), ((), ())),
            preferred_element_type=q_s.dtype)               # [B, chunk]
        gids = gid0 + jnp.arange(chunk_rows)
        scores = jnp.where(gids[None, :] < num_items, scores, -jnp.inf)
        if exclude:
            from sagnn_tpu.ops.chunking import scatter_local_mask
            seen = scatter_local_mask(seen_seq, gid0, chunk_rows,
                                      valid=seen_mask)
            scores = jnp.where(seen, -jnp.inf, scores)
        v, i = jax.lax.approx_max_k(scores, k_local,
                                    recall_target=recall_target)
        mv = jnp.concatenate([best_v, v], axis=1)           # [B, k+k_local]
        mi = jnp.concatenate([best_i, gid0 + i], axis=1)
        best_v, order = jax.lax.top_k(mv, k)                # exact merge
        best_i = jnp.take_along_axis(mi, order, axis=-1)
        return (best_v, best_i), None

    init = (jnp.full((B, k), -jnp.inf, dtype=q_s.dtype),
            jnp.zeros((B, k), jnp.int32))
    (vals, ids), _ = jax.lax.scan(body, init, (tbl, starts))
    if score_dtype is not None:
        # exact f32 rerank of the O(k) winners: gather their rows and
        # rescore with the full-precision queries
        rows = jnp.take(item_table, ids, axis=0)            # [B, k, D]
        exact = jnp.einsum("bd,bkd->bk", queries, rows)
        # re-mask: winners that were -inf in the stream (tiny catalogs
        # where k > real candidates) must stay -inf after rescore
        exact = jnp.where(jnp.isneginf(vals.astype(jnp.float32)),
                          -jnp.inf, exact)
        vals, order = jax.lax.top_k(exact, k)
        ids = jnp.take_along_axis(ids, order, axis=-1)
    return vals, ids


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _interval_propagation(params: Dict, graphs: Dict[str, jnp.ndarray],
                          cfg: ModelConfig, num_users: int, num_items: int,
                          mesh=None, dropout_rng: Optional[jax.Array] = None
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LightGCN-style propagation per interval (model.py:118-129).

    dropout_rng: when given and cfg.edge_dropout_keep < 1 (non-parity Q1
    variant), a per-step Bernoulli edge mask scaled by 1/keep is folded
    into the edge weights — drawn independently per direction, matching
    the reference's two separate edgeDropout calls (model.py:121-122).

    Returns user_vec [g, U, D], item_vec [g, I, D] — the layer-summed
    per-interval node states. Implemented as a lax.scan over the interval
    axis so HLO size is independent of graph_num.

    Backend selection: "xla" uses jax.ops.segment_sum (gather+scatter);
    "pallas" uses the one-hot-matmul kernel with scan-stacked plans
    (graphs["plans"], built by ops.spmm_pallas.build_stacked_plans) — its
    custom VJP also removes the scatter from the backward pass; "ring" runs
    explicitly edge-partitioned hops over the mesh's 'model' axis with the
    boundary exchange overlapped against local aggregation (graphs["ring"],
    built by parallel.edge_partition.build_interval_ring_partitions).
    """
    leaky = cfg.leaky
    drop = dropout_rng is not None and cfg.edge_dropout_keep < 1.0

    def dropout_mask(key, w):
        keep = cfg.edge_dropout_keep
        m = jax.random.bernoulli(key, keep, w.shape).astype(w.dtype)
        return w * m / keep

    def scan_body(f):
        # remat_propagation: recompute hop activations in the backward pass
        # instead of storing g*gnn_layer*2 [N, D] intermediates
        return jax.checkpoint(f) if cfg.remat_propagation else f

    if cfg.spmm_backend == "ring":
        assert not drop, ("edge_dropout_keep < 1 is not wired for the ring "
                          "backend (weights are host-bucketed)")
        assert mesh is not None, "ring backend needs the model's mesh"
        assert "ring" in graphs, "ring backend needs graphs['ring']"
        from sagnn_tpu.parallel.edge_partition import (
            _round_up, ring_spmm_arrays, ring_spmm_pallas)
        ring = graphs["ring"]
        ring_weighted = cfg.edge_norm is not None
        P_ = mesh.shape["model"]
        rows_u = _round_up(-(-num_users // P_), 8)
        rows_i = _round_up(-(-num_items // P_), 8)
        pad_u = P_ * rows_u - num_users
        pad_i = P_ * rows_i - num_items

        if "u_plan" in ring:
            # Pallas segment-sum on the ring (ring_spmm_pallas): each
            # bucket aggregation runs the one-hot-matmul kernel instead of
            # XLA's scatter; valid for unweighted/symmetric weights (the
            # paired-plan VJP transposes exactly then)
            assert cfg.edge_norm in (None, "sym_sqrt"), (
                "pallas ring supports unweighted or symmetric weights; "
                "direction-dependent norms use the XLA ring")
            from sagnn_tpu.ops.spmm_pallas import R as _R
            nb_u = -(-rows_u // _R)
            nb_i = -(-rows_i // _R)
            keys = ("src", "tgt_local", "chunk_block", "chunk_first")
            if ring_weighted:
                keys = keys + ("weights",)

            def hop_pl(x, fwd, bwd, rf, nbf, rb, nbb):
                agg = ring_spmm_pallas(mesh, x, fwd, bwd, rf, nbf, rb, nbb,
                                       "model")
                return jnp.maximum(leaky * agg, agg)

            def one_interval_pl(_, inp):
                u0, i0, pu, pi = inp
                u0 = jnp.pad(u0, ((0, pad_u), (0, 0)))
                i0 = jnp.pad(i0, ((0, pad_i), (0, 0)))
                fu = tuple(pu[k] for k in keys)
                fi = tuple(pi[k] for k in keys)
                embs0, embs1 = [u0], [i0]
                for _l in range(cfg.gnn_layer):
                    a0 = hop_pl(embs1[-1], fu, fi, rows_u, nb_u, rows_i,
                                nb_i)
                    a1 = hop_pl(embs0[-1], fi, fu, rows_i, nb_i, rows_u,
                                nb_u)
                    embs0.append(a0 + embs0[-1])
                    embs1.append(a1 + embs1[-1])
                return None, (sum(embs0[1:], embs0[0])[:num_users],
                              sum(embs1[1:], embs1[0])[:num_items])

            _, (user_vec, item_vec) = jax.lax.scan(
                scan_body(one_interval_pl), None,
                (params["reg"]["u_embed"], params["reg"]["i_embed"],
                 ring["u_plan"], ring["i_plan"]))
            return user_vec, item_vec

        if ring_weighted:
            assert "u_weights" in ring, (
                "edge_norm set but graphs['ring'] carries no bucketed "
                "weights (build_interval_ring_partitions(weights=...))")

        def hop(x, src_l, tgt_l, rows, w):
            agg = ring_spmm_arrays(mesh, x, src_l, tgt_l, rows,
                                   weights=w if ring_weighted else None)
            return jnp.maximum(leaky * agg, agg)

        def one_interval(_, inp):
            u0, i0, us, ut, isrc, itgt, uw, iw = inp
            u0 = jnp.pad(u0, ((0, pad_u), (0, 0)))
            i0 = jnp.pad(i0, ((0, pad_i), (0, 0)))
            embs0, embs1 = [u0], [i0]
            for _l in range(cfg.gnn_layer):
                a0 = hop(embs1[-1], us, ut, rows_u, uw)
                a1 = hop(embs0[-1], isrc, itgt, rows_i, iw)
                embs0.append(a0 + embs0[-1])
                embs1.append(a1 + embs1[-1])
            return None, (sum(embs0[1:], embs0[0])[:num_users],
                          sum(embs1[1:], embs1[0])[:num_items])

        if ring_weighted:
            u_w, i_w = ring["u_weights"], ring["i_weights"]
        else:
            P_b = ring["u_src_local"].shape[1]
            u_w = i_w = jnp.zeros((cfg.graph_num, P_b, P_b, 0), jnp.float32)
        _, (user_vec, item_vec) = jax.lax.scan(
            scan_body(one_interval), None,
            (params["reg"]["u_embed"], params["reg"]["i_embed"],
             ring["u_src_local"], ring["u_tgt_local"],
             ring["i_src_local"], ring["i_tgt_local"], u_w, i_w))
        return user_vec, item_vec

    use_pallas = cfg.spmm_backend == "pallas"
    weighted = cfg.edge_norm is not None or drop
    if weighted and cfg.spmm_backend == "xla":
        # pallas reads edge_weights_canon (or edge_weights as the sym_sqrt
        # fallback below); ring reads its bucketed copies — only the XLA
        # backend needs the raw per-direction array device-resident
        assert "edge_weights" in graphs, (
            "edge_norm set but graphs['edge_weights'] missing (Trainer "
            "attaches it from data.graph.edge_weights)")
    if cfg.edge_attention:
        # GAT-style variant: scores from the CURRENT layer's endpoint
        # embeddings -> per-target softmax -> weighted aggregation. Both
        # hops run in ONE canonical edge order (the u-direction sort), so
        # the item-target softmax segments over unsorted ids.
        assert use_pallas, ("edge_attention requires spmm_backend='pallas' "
                            "(SDDMM + weighted-SpMM kernels)")
        assert not weighted, "edge_attention and edge_norm are exclusive"
        assert "plans" in graphs, "edge_attention needs tracked plans"
        from sagnn_tpu.ops.edge_attention import attention_propagate
        from sagnn_tpu.ops.spmm_pallas import R as _R
        nb_u = -(-num_users // _R)
        nb_i = -(-num_items // _R)
        keys = ("src", "tgt_local", "chunk_block", "chunk_first",
                "edge_slot", "edge_pos")
        # canonical-order edge endpoints + real-edge mask, all [g, E]
        u_tgt = graphs["u_tgt"]
        u_src = graphs["u_src"]
        emask = (u_tgt < num_users).astype(jnp.float32)

        def hop(x_src, x_tgt, tgt, fwd, bwd, fnb, fnt, bnb, bnt, m, srt):
            agg = attention_propagate(x_src, x_tgt, tgt, fwd, bwd, fnb,
                                      fnt, bnb, bnt, mask=m,
                                      exact=cfg.spmm_exact,
                                      sorted_targets=srt)
            return jnp.maximum(leaky * agg, agg)

        def one_interval(_, inp):
            u0, i0, pu, pi, ut, us, m = inp
            fu = tuple(pu[k] for k in keys)
            fi = tuple(pi[k] for k in keys)
            embs0, embs1 = [u0], [i0]
            for _l in range(cfg.gnn_layer):
                a0 = hop(embs1[-1], embs0[-1], ut, fu, fi, nb_u, num_users,
                         nb_i, num_items, m, True)
                # item-target hop: canonical order is the u-sort, so the
                # per-item segments are unsorted (srt=False)
                a1 = hop(embs0[-1], embs1[-1], us, fi, fu, nb_i, num_items,
                         nb_u, num_users, m, False)
                embs0.append(a0 + embs0[-1])
                embs1.append(a1 + embs1[-1])
            return None, (sum(embs0[1:], embs0[0]), sum(embs1[1:], embs1[0]))

        _, (user_vec, item_vec) = jax.lax.scan(
            scan_body(one_interval), None,
            (params["reg"]["u_embed"], params["reg"]["i_embed"],
             graphs["plans"]["u"], graphs["plans"]["i"], u_tgt, u_src,
             emask))
        return user_vec, item_vec

    if use_pallas and cfg.spmm_src_shard_rows > 0:
        # SOURCE-SHARDED path for huge node tables (ops.spmm_pallas:
        # XLA's gather emitter drops ~4.2x once the source operand passes
        # ~32 MB; per-shard dynamic-slice gathers stay on the fast path).
        # Trainer resolves spmm_src_shard_rows (auto) and attaches
        # graphs["plans_ss"] (build_stacked_plans_src_sharded).
        assert not weighted and not cfg.edge_attention, (
            "spmm_src_shard_rows > 0 supports only unweighted parity "
            "propagation (no edge_norm/edge_dropout/edge_attention)")
        assert "plans_ss" in graphs, (
            "src-sharded pallas backend needs graphs['plans_ss']")
        from sagnn_tpu.ops.spmm_pallas import R as _R, spmm_src_sharded
        nb_u = -(-num_users // _R)
        nb_i = -(-num_items // _R)
        sr = cfg.spmm_src_shard_rows
        keys = ("src", "tgt_local", "chunk_block", "chunk_first",
                "shard_idx")

        def hop(x, fwd, bwd, fnb, fnt, bnb, bnt, nsrc):
            agg = spmm_src_sharded(x, fwd, bwd, fnb, fnt, sr, bnb, bnt, sr,
                                   nsrc, cfg.spmm_exact,
                                   cfg.spmm_fold_gather)
            return jnp.maximum(leaky * agg, agg)

        def one_interval(_, inp):
            u0, i0, pu, pi = inp
            fu = tuple(pu[k] for k in keys)
            fi = tuple(pi[k] for k in keys)
            embs0, embs1 = [u0], [i0]
            for _l in range(cfg.gnn_layer):
                # the transpose direction's sharded plan IS the backward
                # (bwd shards partition the forward's target space)
                a0 = hop(embs1[-1], fu, fi, nb_u, num_users, nb_i,
                         num_items, num_items)
                a1 = hop(embs0[-1], fi, fu, nb_i, num_items, nb_u,
                         num_users, num_users)
                embs0.append(a0 + embs0[-1])
                embs1.append(a1 + embs1[-1])
            return None, (sum(embs0[1:], embs0[0]), sum(embs1[1:], embs1[0]))

        _, (user_vec, item_vec) = jax.lax.scan(
            scan_body(one_interval), None,
            (params["reg"]["u_embed"], params["reg"]["i_embed"],
             graphs["plans_ss"]["u"], graphs["plans_ss"]["i"]))
        return user_vec, item_vec

    if use_pallas:
        assert "plans" in graphs, "pallas backend needs graphs['plans']"
        from sagnn_tpu.ops.spmm_pallas import R as _R, spmm, spmm_weighted
        nb_u = -(-num_users // _R)
        nb_i = -(-num_items // _R)
        keys = ("src", "tgt_local", "chunk_block", "chunk_first")
        if weighted:
            keys = keys + ("edge_slot", "edge_pos")

        def hop(x, w, fwd, bwd, fwd_nb, fwd_nt, bwd_nb, bwd_nt):
            if weighted:
                agg = spmm_weighted(x, w, fwd, bwd, fwd_nb, fwd_nt,
                                    bwd_nb, bwd_nt, cfg.spmm_exact)
            else:
                agg = spmm(x, fwd, bwd, fwd_nb, fwd_nt, bwd_nb, bwd_nt,
                           cfg.spmm_exact, cfg.spmm_fold_gather)
            return jnp.maximum(leaky * agg, agg)

        def one_interval(_, inp):
            u0, i0, pu, pi, w_u, w_i = inp
            fu = tuple(pu[k] for k in keys)
            fi = tuple(pi[k] for k in keys)
            embs0, embs1 = [u0], [i0]
            for _l in range(cfg.gnn_layer):
                # both hops take CANONICAL (u-direction-order) weights —
                # the plans' edge ids map them into each chunk layout; the
                # weights are per-DIRECTION (equal for symmetric norms)
                a0 = hop(embs1[-1], w_u, fu, fi, nb_u, num_users, nb_i,
                         num_items)
                a1 = hop(embs0[-1], w_i, fi, fu, nb_i, num_items, nb_u,
                         num_users)
                embs0.append(a0 + embs0[-1])
                embs1.append(a1 + embs1[-1])
            return None, (sum(embs0[1:], embs0[0]), sum(embs1[1:], embs1[0]))

        if weighted:
            # both directions in canonical order: graphs["edge_weights_canon"]
            # (data.graph.edge_weights_canonical, attached by the Trainer);
            # plain edge_weights[0] suffices for symmetric norms
            if "edge_weights_canon" in graphs:
                w_u_canon, w_i_canon = (graphs["edge_weights_canon"][0],
                                        graphs["edge_weights_canon"][1])
            else:
                assert cfg.edge_norm == "sym_sqrt", (
                    f"edge_norm={cfg.edge_norm!r} is direction-dependent: "
                    "the pallas backend needs graphs['edge_weights_canon']")
                assert "edge_weights" in graphs, (
                    "pallas + edge_norm needs graphs['edge_weights_canon'] "
                    "or raw graphs['edge_weights'] (sym_sqrt only)")
                w_u_canon = w_i_canon = graphs["edge_weights"][0]
            if drop:
                ku, ki = jax.random.split(dropout_rng)
                w_u_canon = dropout_mask(ku, w_u_canon)
                w_i_canon = dropout_mask(ki, w_i_canon)
        else:
            w_u_canon = w_i_canon = jnp.zeros((cfg.graph_num, 0), jnp.float32)
        _, (user_vec, item_vec) = jax.lax.scan(
            scan_body(one_interval), None,
            (params["reg"]["u_embed"], params["reg"]["i_embed"],
             graphs["plans"]["u"], graphs["plans"]["i"],
             w_u_canon, w_i_canon))
        return user_vec, item_vec

    def one_interval(_, inp):
        u0, i0, u_src, u_tgt, i_src, i_tgt, w_u, w_i = inp
        embs0 = [u0]
        embs1 = [i0]
        wu = w_u if weighted else None
        wi = w_i if weighted else None
        for _l in range(cfg.gnn_layer):
            a0 = propagate(embs1[-1], u_src, u_tgt, num_users, leaky, wu)
            a1 = propagate(embs0[-1], i_src, i_tgt, num_items, leaky, wi)
            embs0.append(a0 + embs0[-1])
            embs1.append(a1 + embs1[-1])
        user = sum(embs0[1:], embs0[0])  # tf.add_n over all layers
        item = sum(embs1[1:], embs1[0])
        return None, (user, item)

    if weighted:
        w_u, w_i = graphs["edge_weights"][0], graphs["edge_weights"][1]
        if drop:
            ku, ki = jax.random.split(dropout_rng)
            w_u = dropout_mask(ku, w_u)
            w_i = dropout_mask(ki, w_i)
    else:
        zeros = jnp.zeros((cfg.graph_num, 0), jnp.float32)
        w_u = w_i = zeros
    _, (user_vec, item_vec) = jax.lax.scan(
        scan_body(one_interval), None,
        (params["reg"]["u_embed"], params["reg"]["i_embed"],
         graphs["u_src"], graphs["u_tgt"], graphs["i_src"], graphs["i_tgt"],
         w_u, w_i))
    return user_vec, item_vec


def _temporal_fusion(params: Dict, user_vec: jnp.ndarray,
                     item_vec: jnp.ndarray, cfg: ModelConfig, train: bool,
                     rng: Optional[jax.Array]
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared LSTM + interval MHSA + mean (model.py:131-155).

    Returns final_user [U, D], final_item [I, D].

    fusion_dtype="bf16" runs the whole stack in bf16 (params cast on the fly
    — master weights stay f32, grads flow through the cast; the MXU-heavy
    [N, g, D] streams halve their bandwidth). Parity (Q5 raw-exp attention)
    requires f32, so bf16 forces the stable-softmax attention variant.

    fusion_chunk_rows > 0 streams the node axis in blocks of that many rows
    (lax.map): the whole stack is ROW-PARALLEL per node, so only one
    block's LSTM/attention temporaries are live at a time — at 1M nodes
    this turns several GB of [N, g, D] intermediates into tens of MB.
    The dropout key folds in the block index, so the chunked mask pattern
    differs from the unchunked one (keep_rate=1 paths are bit-identical).
    """
    free = params["free"]
    bf16 = cfg.fusion_dtype == "bf16"
    stable = cfg.stable_softmax or bf16

    def cast(t):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), t) if bf16 else t

    if train and rng is not None and cfg.keep_rate < 1.0:
        ku, ki = jax.random.split(rng)
    else:
        ku = ki = None
    lstm_p = cast(free["lstm"])

    def stream(x_t, mhsa_p, ln_p, key):
        """Per-node-block fusion body: x_t [n, g, D] -> [n, D]."""
        x_t = lstm_scan(lstm_p, x_t, keep_rate=cfg.keep_rate,
                        dropout_key=key)
        m = multi_head_self_attention(
            mhsa_p, layer_norm(x_t, ln_p["scale"], ln_p["shift"]),
            cfg.num_heads, stable=stable)
        return jnp.mean(m, axis=1).astype(jnp.float32)

    def fuse(vec, mhsa_p, ln_p, key):
        rows = cfg.fusion_chunk_rows
        n = vec.shape[1]
        if rows <= 0 or n <= rows:
            x_t = cast(jnp.transpose(vec, (1, 0, 2)))  # [N, g, D]
            return stream(x_t, mhsa_p, ln_p, key)
        # slice node blocks straight from the [g, N, D] scan output —
        # transposing/padding the FULL table first materializes it in a
        # lane-padded layout (measured 2.7x expansion at [1M, 3, 64]).
        # jax.checkpoint sits INSIDE each block (incl. the slice), so the
        # map's backward keeps only the scan-invariant `vec` + a block
        # index per iteration and recomputes within-block intermediates —
        # an OUTER checkpoint would stack per-block LSTM residuals
        # [nb, rows, g, D] x gates, re-creating the unchunked footprint.
        nb = n // rows

        def body(vec_, mhsa_, ln_, key_, i):
            xb = jax.lax.dynamic_slice_in_dim(vec_, i * rows, rows, axis=1)
            kb = None if key_ is None else jax.random.fold_in(key_, i)
            return stream(cast(jnp.transpose(xb, (1, 0, 2))), mhsa_,
                          ln_, kb)

        body_ck = jax.checkpoint(body)
        parts = []
        if nb:
            out = jax.lax.map(
                lambda i: body_ck(vec, mhsa_p, ln_p, key, i),
                jnp.arange(nb))                        # [nb, rows, D]
            parts.append(out.reshape(nb * rows, -1))
        if n - nb * rows:                              # remainder block

            def rem(vec_, mhsa_, ln_, key_):
                xb = vec_[:, nb * rows:]
                kb = None if key_ is None \
                    else jax.random.fold_in(key_, nb)
                return stream(cast(jnp.transpose(xb, (1, 0, 2))), mhsa_,
                              ln_, kb)

            parts.append(jax.checkpoint(rem)(vec, mhsa_p, ln_p, key))
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    mu = fuse(user_vec, cast(free["mhsa_user"]), cast(free["ln_user"]), ku)
    mi = fuse(item_vec, cast(free["mhsa_item"]), cast(free["ln_item"]), ki)
    return mu, mi


def _sequence_branch(params: Dict, item_att_emb: jnp.ndarray,
                     seq: jnp.ndarray, seq_mask: jnp.ndarray,
                     cfg: ModelConfig, mesh=None) -> jnp.ndarray:
    """Sequence branch. Parity mode (default) replicates quirk Q3
    (model.py:158-167): the mask-matmul collapses the sequence to ONE token
    [B, 1, D] before the attention stack. With
    cfg.per_token_seq_attention=True, true per-token masked self-attention
    over the [B, L, D] sequence runs instead (the non-parity "fixed"
    variant); with cfg.seq_parallel on top, each attention layer runs
    ring attention with the sequence axis sharded over the mesh's 'model'
    axis (parallel/ring_attention.py). Returns att_user [B, D].

    fusion_dtype="bf16" runs the attention stack in bf16 (see
    _temporal_fusion); the returned vector is cast back to f32."""
    bf16 = cfg.fusion_dtype == "bf16"

    def cast(t):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), t) if bf16 else t

    free = cast(params["free"])
    stable_pool = cfg.stable_softmax or bf16
    seq_emb = jnp.take(item_att_emb, seq, axis=0)          # [B, L, D]
    seq_emb = cast(seq_emb)
    seq_mask = cast(seq_mask)
    pos_embed = cast(params["reg"]["pos_embed"])

    if cfg.per_token_seq_attention:
        ring = cfg.seq_parallel
        if ring:
            assert mesh is not None, "seq_parallel needs the model's mesh"
            from sagnn_tpu.parallel.ring_attention import (
                ring_multi_head_self_attention)
        pos = jnp.broadcast_to(pos_embed[None], seq_emb.shape)
        x = layer_norm(seq_emb, free["seq_ln_item"]["scale"],
                       free["seq_ln_item"]["shift"])
        x = x + layer_norm(pos, free["seq_ln_pos"]["scale"],
                           free["seq_ln_pos"]["shift"])
        x = x * seq_mask[:, :, None]
        for i in range(cfg.att_layer):
            ln = free["seq_ln"][i]
            xn = layer_norm(x, ln["scale"], ln["shift"])
            if ring:
                h = ring_multi_head_self_attention(
                    mesh, free["seq_mhsa"][i], xn, cfg.num_heads,
                    seq_mask, axis="model")
            else:
                h = multi_head_self_attention(
                    free["seq_mhsa"][i], xn,
                    cfg.num_heads, stable=True, mask=seq_mask)
            x = leaky_relu(h, cfg.leaky) + x
        return jnp.sum(x * seq_mask[:, :, None],
                       axis=1).astype(jnp.float32)         # [B, D]

    pooled_items = jnp.einsum("bl,bld->bd", seq_mask, seq_emb)[:, None, :]
    pooled_pos = jnp.einsum(
        "bl,ld->bd", seq_mask, pos_embed)[:, None, :]

    x = layer_norm(pooled_items, free["seq_ln_item"]["scale"],
                   free["seq_ln_item"]["shift"])
    x = x + layer_norm(pooled_pos, free["seq_ln_pos"]["scale"],
                       free["seq_ln_pos"]["shift"])
    for i in range(cfg.att_layer):
        ln = free["seq_ln"][i]
        h = multi_head_self_attention(
            free["seq_mhsa"][i],
            layer_norm(x, ln["scale"], ln["shift"]),
            cfg.num_heads, stable=stable_pool)
        x = leaky_relu(h, cfg.leaky) + x  # model.py:166
    return jnp.sum(x, axis=1).astype(jnp.float32)  # [B, D] (model.py:167)


def _user_weights(params: Dict, final_user: jnp.ndarray,
                  user_vec: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Meta-network per-user SSL weights, [g, U] (model.py:176-184)."""
    reg, free = params["reg"], params["free"]

    def per_graph(uv_k):
        meta1 = jnp.concatenate(
            [final_user * uv_k, final_user, uv_k], axis=-1)   # [U, 3D]
        meta2 = leaky_relu(meta1 @ reg["meta2_w"] + free["meta2_b"],
                           cfg.leaky)
        w = jax.nn.sigmoid(meta2 @ reg["meta3_w"] + free["meta3_b"])
        return jnp.squeeze(w, -1)                             # [U]

    return jax.vmap(per_graph)(user_vec)                      # [g, U]


def _ssl_loss(params: Dict, batch: TrainBatch, final_user: jnp.ndarray,
              final_item: jnp.ndarray, user_vec: jnp.ndarray,
              item_vec: jnp.ndarray, cfg: ModelConfig) -> jax.Array:
    """Personalized self-augmented loss (model.py:185-204).

    For each interval k and pair j: with (uA, iA) and (uB, iB) the two halves
    of the reference's interleaved layout,
        S_final = w(uA)·sg(score_long(uA,iA)) − w(uB)·sg(score_long(uB,iB))
        loss   += Σ max(0, 1 − S_final·(score_short_A − score_short_B))
    where score(u,i) = Σ leakyRelu(u_emb ⊙ i_emb) and w is the meta-net
    weight (model.py:178-184).

    The meta-net runs only on the SAMPLED pair users (gathered [g, Pssl]
    rows) — the reference materializes it for the whole user table first
    (model.py:180-184, a TF1-graph convenience), which at 1M users costs a
    [g, U, 3D] concat (2.3 GB, plus its backward) for weights the loss
    reads at a few thousand rows. Row-wise ops commute with the gather, so
    the values are identical (pinned by the TF fixture).
    """
    leaky = cfg.leaky
    reg, free = params["reg"], params["free"]

    def meta_w(fu_rows, uv_rows):
        m1 = jnp.concatenate([fu_rows * uv_rows, fu_rows, uv_rows], axis=-1)
        m2 = leaky_relu(m1 @ reg["meta2_w"] + free["meta2_b"], leaky)
        return jnp.squeeze(
            jax.nn.sigmoid(m2 @ reg["meta3_w"] + free["meta3_b"]), -1)

    def score(ue, ie, u_idx, i_idx):
        pu = jnp.take(ue, u_idx, axis=0)
        pi = jnp.take(ie, i_idx, axis=0)
        return jnp.sum(leaky_relu(pu * pi, leaky), axis=-1)

    def per_graph(inp):
        uv_k, iv_k, ua, ia, ub, ib, m = inp
        s_long_a = jax.lax.stop_gradient(score(final_user, final_item, ua, ia))
        s_long_b = jax.lax.stop_gradient(score(final_user, final_item, ub, ib))
        w_a = meta_w(jnp.take(final_user, ua, axis=0),
                     jnp.take(uv_k, ua, axis=0))
        w_b = meta_w(jnp.take(final_user, ub, axis=0),
                     jnp.take(uv_k, ub, axis=0))
        s_final = w_a * s_long_a - w_b * s_long_b
        s_short_a = score(uv_k, iv_k, ua, ia)
        s_short_b = score(uv_k, iv_k, ub, ib)
        hinge = jnp.maximum(0.0, 1.0 - s_final * (s_short_a - s_short_b))
        return jnp.sum(hinge * m)

    xs = (user_vec, item_vec,
          batch.ssl_u_a, batch.ssl_i_a, batch.ssl_u_b, batch.ssl_i_b,
          batch.ssl_mask)
    if user_vec.shape[1] * user_vec.shape[2] <= 2 ** 24:
        # small graphs: batch all intervals into one set of gathers/matmuls
        losses = jax.vmap(per_graph)(xs)
    else:
        # huge graphs: vmap'd node-table gathers flatten [g, N, D] into a
        # row-major [g*N, D] copy (2x lane-padded at D=64 — 2.3 GB at 1M
        # nodes); a sequential map keeps one interval's gather live
        losses = jax.lax.map(per_graph, xs)
    return jnp.sum(losses)


# ---------------------------------------------------------------------------
# Public model facade
# ---------------------------------------------------------------------------

class SelfGNN:
    """Functional model facade binding a config + graph sizes.

    Graphs are passed per-call as a dict of [g, E] int32 arrays
    (u_src/u_tgt/i_src/i_tgt, from data.graph.compile_interval_graphs) so the
    same compiled executable serves any graph with the same padded shape.
    """

    def __init__(self, cfg: ModelConfig, num_users: int, num_items: int,
                 mesh=None):
        """mesh: required only for cfg.spmm_backend == "ring" — the
        shard_map ring hops embed the concrete mesh."""
        self.cfg = cfg
        self.num_users = num_users
        self.num_items = num_items
        self.mesh = mesh

    def init(self, key: jax.Array) -> Dict:
        return init_params(key, self.cfg, self.num_users, self.num_items)

    def encode(self, params: Dict, graphs: Dict[str, jnp.ndarray],
               train: bool = False, rng: Optional[jax.Array] = None):
        """Full-graph encoding shared by train and eval.

        Returns (final_user [U,D], final_item [I,D],
                 user_vec [g,U,D], item_vec [g,I,D]).
        """
        drop_rng = None
        if (train and rng is not None
                and self.cfg.edge_dropout_keep < 1.0):
            # split only when edge dropout is active so the parity path's
            # LSTM-dropout key stream is untouched
            rng, drop_rng = jax.random.split(rng)
        user_vec, item_vec = _interval_propagation(
            params, graphs, self.cfg, self.num_users, self.num_items,
            mesh=self.mesh, dropout_rng=drop_rng)
        fusion = _temporal_fusion
        if self.cfg.remat_propagation and self.cfg.fusion_chunk_rows <= 0:
            # remat covers the fusion stack too: the LSTM/MHSA over every
            # node stores O(g·N·D) gate/attention intermediates for the
            # backward — at 1M nodes that is several GB better recomputed.
            # (The chunked path embeds its own per-block checkpoints; an
            # outer one there would stack per-block residuals instead.)
            def fusion(p, uv, iv, c, t, r, _f=_temporal_fusion):
                return jax.checkpoint(
                    lambda p_, uv_, iv_, r_: _f(p_, uv_, iv_, c, t, r_)
                )(p, uv, iv, r)
        final_user, final_item = fusion(
            params, user_vec, item_vec, self.cfg, train, rng)
        return final_user, final_item, user_vec, item_vec

    def train_losses(self, params: Dict, graphs: Dict[str, jnp.ndarray],
                     batch: TrainBatch, rng: Optional[jax.Array] = None
                     ) -> Tuple[jax.Array, jax.Array, Dict]:
        """(preLoss, sslloss, aux) for one step (model.py:241-246)."""
        cfg = self.cfg
        final_user, final_item, user_vec, item_vec = self.encode(
            params, graphs, train=True, rng=rng)
        att_user = _sequence_branch(params, final_item, batch.seq,
                                    batch.seq_mask, cfg, mesh=self.mesh)

        def preds(iids):
            pu = jnp.take(final_user, batch.uids, axis=0)
            pi = jnp.take(final_item, iids, axis=0)
            base = jnp.sum(pu * pi, axis=-1)
            au = leaky_relu(jnp.take(att_user, batch.useq_row, axis=0),
                            cfg.leaky)
            pia = jnp.take(final_item, iids, axis=0)  # iEmbed_att == final_item
            return base + jnp.sum(au * pia, axis=-1)  # model.py:169-173

        pos = preds(batch.pos_iids)
        neg = preds(batch.neg_iids)
        hinge = jnp.maximum(0.0, 1.0 - (pos - neg)) * batch.pair_mask
        # reference: reduce_mean over the real pairs (model.py:244)
        pre_loss = jnp.sum(hinge) / jnp.maximum(1.0, jnp.sum(batch.pair_mask))

        ssl = _ssl_loss(params, batch, final_user, final_item, user_vec,
                        item_vec, cfg)
        aux = {"pos_pred": pos, "neg_pred": neg}
        return pre_loss, ssl, aux

    def score_candidates(self, params: Dict, graphs: Dict[str, jnp.ndarray],
                         user_ids: jnp.ndarray, cand_iids: jnp.ndarray,
                         seq: jnp.ndarray, seq_mask: jnp.ndarray
                         ) -> jax.Array:
        """Test scoring: users [B], candidates [B, C] -> scores [B, C]
        (the eval path of model.py:169-173 with keepRate=1)."""
        final_user, final_item, _, _ = self.encode(params, graphs,
                                                   train=False)
        return self.score_with_encodings(params, final_user, final_item,
                                         user_ids, cand_iids, seq, seq_mask)

    def recommend_top_k(self, params: Dict, graphs: Dict[str, jnp.ndarray],
                        user_ids: jnp.ndarray, seq: jnp.ndarray,
                        seq_mask: jnp.ndarray, k: int = 10,
                        exclude_seen: bool = True,
                        recall_target: float = 1.0,
                        chunk_rows: int = 0
                        ) -> Tuple[jax.Array, jax.Array]:
        """Serving path: top-k items over the FULL catalog for a user batch.

        Not present in the reference (it only ranks precomputed candidate
        sets); provided as the production inference surface. Scores every
        item with the same two-term head as model.py:169-173, optionally
        masking the user's own input sequence, and returns
        (scores [B, k], item_ids [B, k]) in descending score order.

        Selection uses the TPU-optimized approx_max_k instead of the
        sort-based lax.top_k (measured 16 -> 4.4 ms exact on [256, 41k],
        1.8 ms at recall_target=0.95); recall_target=1.0 (default) is
        exact, lower values trade recall for throughput.

        chunk_rows: 0 = auto (dense scoring up to a 131,072-item catalog,
        streamed past it); -1 = force dense; >0 = stream the catalog in
        chunks of this many items (chunked_topk — bounds memory at
        O(B * chunk_rows) for 1M-item-scale catalogs).
        """
        final_user, final_item, _, _ = self.encode(params, graphs,
                                                   train=False)
        if chunk_rows == 0:
            from sagnn_tpu.ops.chunking import auto_chunk_rows
            chunk_rows = auto_chunk_rows(self.num_items)
        if chunk_rows > 0:
            queries = self.serving_queries(params, final_user, final_item,
                                           user_ids, seq, seq_mask)
            return chunked_topk(queries, final_item, self.num_items, k,
                                chunk_rows, recall_target,
                                seen_seq=seq if exclude_seen else None,
                                seen_mask=seq_mask if exclude_seen else None)
        scores = self.score_all_items(params, final_user, final_item,
                                      user_ids, seq, seq_mask)
        if exclude_seen:
            from sagnn_tpu.ops.chunking import scatter_local_mask
            seen = scatter_local_mask(seq, 0, self.num_items,
                                      valid=seq_mask)
            scores = jnp.where(seen, -jnp.inf, scores)
        return topk_descending(scores, k, recall_target)

    def serving_queries(self, params: Dict, final_user: jnp.ndarray,
                        final_item: jnp.ndarray, user_ids: jnp.ndarray,
                        seq: jnp.ndarray, seq_mask: jnp.ndarray
                        ) -> jax.Array:
        """Per-user head vector q = final_user[uid] + leakyReLU(att_user)
        [B, D]: the two-term head of model.py:169-173 folded into one
        query vector (both terms dot the same final_item row, so
        scores = q @ final_item^T). This is the query side of the
        serving path — parallel.serving shards the catalog side."""
        cfg = self.cfg
        att_user = _sequence_branch(params, final_item, seq, seq_mask, cfg,
                                    mesh=self.mesh)
        pu = jnp.take(final_user, user_ids, axis=0)           # [B, D]
        au = leaky_relu(att_user, cfg.leaky)                  # [B, D]
        return pu + au

    def score_all_items(self, params: Dict, final_user: jnp.ndarray,
                        final_item: jnp.ndarray, user_ids: jnp.ndarray,
                        seq: jnp.ndarray, seq_mask: jnp.ndarray
                        ) -> jax.Array:
        """Full-catalog scores [B, num_items] from precomputed encodings —
        (pu + leakyReLU(att_user)) @ final_item^T. Backs both the full-sort
        evaluation protocol and the serving path."""
        return self.serving_queries(params, final_user, final_item,
                                    user_ids, seq, seq_mask) @ final_item.T

    def score_with_encodings(self, params: Dict, final_user: jnp.ndarray,
                             final_item: jnp.ndarray, user_ids: jnp.ndarray,
                             cand_iids: jnp.ndarray, seq: jnp.ndarray,
                             seq_mask: jnp.ndarray) -> jax.Array:
        """Candidate scoring from precomputed node encodings. Eval is
        deterministic (keepRate=1), so encoding once per test epoch and
        reusing it across batches is exact — unlike the reference, which
        re-runs the full forward per test batch (model.py:459)."""
        cfg = self.cfg
        att_user = _sequence_branch(params, final_item, seq, seq_mask, cfg,
                                    mesh=self.mesh)
        pu = jnp.take(final_user, user_ids, axis=0)           # [B, D]
        pi = jnp.take(final_item, cand_iids, axis=0)          # [B, C, D]
        base = jnp.einsum("bd,bcd->bc", pu, pi)
        au = leaky_relu(att_user, cfg.leaky)                  # [B, D]
        return base + jnp.einsum("bd,bcd->bc", au, pi)
