"""Serving-path benchmark: full-catalog top-k recommendation throughput.

Two numbers matter for serving (scripts/recommend.py surface):
  - encode latency: one full-graph forward (propagation + fusion) that
    refreshes the catalog encodings — paid per model/catalog update;
  - per-request scoring throughput: users/s through the two-term head +
    full-catalog top-k from precomputed encodings (the per-query cost).

Timing uses the chained-dispatch discipline from bench.py (the relay adds
~16 ms per dispatch; chain data-dependent evals inside one jit).

Usage: python scripts/bench_serving.py [--batch 256] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN = 8
ITERS = 10


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--num_users", type=int, default=49_152)
    ap.add_argument("--num_items", type=int, default=40_960)
    ap.add_argument("--backend", default="pallas", choices=["pallas", "xla"])
    ap.add_argument("--recall", type=float, default=1.0,
                    help="top-k recall target (1.0 = exact)")
    ap.add_argument("--chunk", type=int, default=0,
                    help="serving catalog chunk rows (0 = auto: dense up "
                         "to 131k items, 65,536-row streaming past it; "
                         "-1 = force dense)")
    ap.add_argument("--serve_dtype", default="f32", choices=["f32", "bf16"],
                    help="first-stage score stream dtype (bf16 halves the "
                         "dominant HBM cost; winners are rescored exactly "
                         "in f32)")
    ap.add_argument("--synth_edges", type=int, default=0,
                    help="use the vectorized large-graph generator with "
                         "this many total edges (required past ~50k users "
                         "/ 100k items — synthetic_dataset is O(U*I))")
    ap.add_argument("--fusion_chunk_rows", type=int, default=0,
                    help="stream the temporal fusion in node blocks (the "
                         "encode-side memory lever; needed at ~1M users "
                         "x 1M items)")
    ap.add_argument("--sustained", type=int, default=0,
                    help="ALSO run a pipelined request stream of this many "
                         "distinct batches (lag-1 in flight): sustained "
                         "users/s + p50/p95 per-batch completion latency, "
                         "and a catalog re-encode interleaved mid-stream "
                         "(VERDICT r4 #6 — replaces single-dispatch "
                         "extrapolations)")
    ap.add_argument("--recalls", default="",
                    help="comma-separated recall targets for the sustained "
                         "stream (default: just --recall)")
    ns = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from sagnn_tpu.config import Config, ModelConfig, TrainConfig
    from sagnn_tpu.data.synthetic import (synthetic_dataset,
                                          synthetic_large_dataset)
    from sagnn_tpu.train.trainer import Trainer

    cfg = Config(
        model=ModelConfig(graph_num=3, gnn_layer=2, att_layer=1, latdim=64,
                          num_heads=4, ssldim=48, pos_length=200,
                          keep_rate=1.0, spmm_backend=ns.backend,
                          fusion_chunk_rows=ns.fusion_chunk_rows),
        train=TrainConfig(batch=ns.batch, samp_num=4, ssl_num=4,
                          trn_num=1024, test_size=20),
    )
    if ns.synth_edges > 0:
        bundle = synthetic_large_dataset(
            num_users=ns.num_users, num_items=ns.num_items,
            total_edges=ns.synth_edges, graph_num=3, test_size=20,
            num_test_users=1024, seed=7)
    else:
        bundle = synthetic_dataset(num_users=ns.num_users,
                                   num_items=ns.num_items, graph_num=3,
                                   test_size=20, seed=7,
                                   seq_len_range=(10, 50))
    tr = Trainer(cfg, bundle, ckpt_root="/tmp/bench_serving_models")
    model, graphs, params = tr.model, tr.graphs, tr.state["params"]
    B, L = ns.batch, cfg.model.pos_length

    rng = np.random.default_rng(0)
    user_ids = jnp.asarray(rng.integers(0, ns.num_users, B, np.int32))
    seq = jnp.asarray(rng.integers(1, ns.num_items, (B, L), np.int32))
    mask = jnp.asarray((rng.random((B, L)) < 0.3).astype(np.float32))

    from sagnn_tpu.utils.profiling import time_scalar_fetch

    def timeit(name, fn, *args, chain=1):
        ms, _ = time_scalar_fetch(fn, *args, iters=ITERS, chain=chain)
        print(f"{name:22s} {ms:8.2f} ms", file=sys.stderr)
        return ms

    # -- encode latency (single dispatch; includes one relay round trip).
    # params/graphs ride as jit ARGUMENTS (closure constants enter the
    # remote-compile payload — HTTP 413 past ~100 MB).
    @jax.jit
    def encode(p, g):
        fu, fi, _, _ = model.encode(p, g, train=False)
        return fu, fi

    enc_ms = timeit("encode (catalog)", encode, params, graphs)
    fu, fi = encode(params, graphs)

    # -- scoring throughput: chained top-k over the full catalog from
    # precomputed encodings (the per-query steady-state cost). BOTH fu and
    # the fi feeding the sequence branch are perturbed by the carry —
    # perturbing only fu would let XLA hoist that branch out of the scan
    # and understate the per-request cost. The raw catalog table stays
    # loop-invariant (its pad/reshape prep is hoisted — in production it is
    # done once per catalog refresh, not per request).
    from sagnn_tpu.models.selfgnn import chunked_topk, topk_descending

    from sagnn_tpu.ops.chunking import auto_chunk_rows
    chunk = ns.chunk or auto_chunk_rows(ns.num_items)
    sdt = jnp.bfloat16 if ns.serve_dtype == "bf16" else None

    @jax.jit
    def head_chain(p, fu, fi, c0):
        def body(c, _):
            fup, fip = fu + c * 1e-12, fi + c * 1e-12
            if chunk > 0:
                q = model.serving_queries(p, fup, fip, user_ids, seq, mask)
                top, ids = chunked_topk(q, fi, ns.num_items, ns.k,
                                        chunk_rows=chunk,
                                        recall_target=ns.recall,
                                        score_dtype=sdt)
            else:
                s = model.score_all_items(p, fup, fip, user_ids, seq, mask)
                top, ids = topk_descending(s, ns.k, ns.recall)
            return c * 1e-20 + top[0, 0], None
        c, _ = jax.lax.scan(body, c0, None, length=CHAIN)
        return c

    head_ms = timeit("score+topk /batch", head_chain, params, fu, fi,
                     jnp.float32(0.0), chain=CHAIN)
    qps = B / (head_ms / 1e3)
    out = {"encode_ms": round(enc_ms, 2),
           "score_topk_ms_per_batch": round(head_ms, 2),
           "users_per_s": round(qps),
           "batch": B, "k": ns.k, "items": ns.num_items,
           "chunk_rows": chunk, "serve_dtype": ns.serve_dtype,
           "backend": ns.backend}

    # -- sustained pipelined stream (VERDICT r4 #6) -------------------------
    # DISTINCT per-request batches with ONE request in flight (lag-1: fetch
    # batch i-1's winners while batch i runs). Unlike the chained-scan
    # number above, this includes every per-dispatch cost a live server
    # pays, measures completion-to-completion latency percentiles over the
    # stream, and injects a catalog re-encode mid-stream to measure the
    # tail a refresh adds to concurrent serving. Request tensors are
    # staged to device up front: a production host feeds the chip over
    # PCIe, whereas staging through THIS image's HTTP relay would time the
    # relay, not the chip.
    if ns.sustained > 0:
        import time as _time
        recalls = ([float(r) for r in ns.recalls.split(",")]
                   if ns.recalls else [ns.recall])
        for recall in recalls:
            def make_head_one(recall):
                @jax.jit
                def head_one(p, fu, fi, uids, seq, mask):
                    if chunk > 0:
                        q = model.serving_queries(p, fu, fi, uids, seq,
                                                  mask)
                        return chunked_topk(q, fi, ns.num_items, ns.k,
                                            chunk_rows=chunk,
                                            recall_target=recall,
                                            score_dtype=sdt)
                    s = model.score_all_items(p, fu, fi, uids, seq, mask)
                    return topk_descending(s, ns.k, recall)
                return head_one

            head_one = make_head_one(recall)
            n = ns.sustained
            reqs = []
            for i in range(n):
                r = np.random.default_rng(1000 + i)
                reqs.append((
                    jnp.asarray(r.integers(0, ns.num_users, B, np.int32)),
                    jnp.asarray(r.integers(1, ns.num_items, (B, L),
                                           np.int32)),
                    jnp.asarray((r.random((B, L)) < 0.3)
                                .astype(np.float32))))
            v, _ = head_one(params, fu, fi, *reqs[0])
            float(v[0, 0])                      # compile + warm
            enc_at = n // 2
            enc_pending = None
            completions = []
            pending = None
            t_start = _time.perf_counter()
            for i, r in enumerate(reqs):
                if i == enc_at:
                    # catalog refresh dispatched WHILE serving continues
                    enc_pending = encode(params, graphs)
                cur = head_one(params, fu, fi, *r)
                if pending is not None:
                    float(pending[0][0, 0])
                    completions.append(_time.perf_counter())
                pending = cur
            float(pending[0][0, 0])
            completions.append(_time.perf_counter())
            if enc_pending is not None:
                jax.block_until_ready(enc_pending)
            gaps = np.diff(np.asarray(completions)) * 1e3
            total_s = completions[-1] - t_start
            # the encode lands in the completion-gap window around its
            # dispatch (exact slot depends on how the relay pipelines the
            # two programs); the added tail is the worst gap there vs the
            # stream median, and argmax_offset verifies the attribution
            w0 = max(0, enc_at - 2)
            enc_window = gaps[w0:enc_at + 10] if len(gaps) > w0 else gaps
            sus = {
                "recall_target": recall,
                "sustained_batches": n,
                "sustained_users_per_s": round(B * len(completions)
                                               / total_s),
                "batch_ms_p50": round(float(np.percentile(gaps, 50)), 2),
                "batch_ms_p95": round(float(np.percentile(gaps, 95)), 2),
                "batch_ms_max": round(float(gaps.max()), 2),
                "max_gap_offset_from_encode": int(np.argmax(gaps)
                                                  - enc_at),
                "encode_overlap_added_tail_ms": round(
                    float(enc_window.max() - np.percentile(gaps, 50)), 2),
            }
            print(f"sustained recall={recall}: {sus}", file=sys.stderr)
            out.setdefault("sustained", []).append(sus)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
