"""Benchmark: edges/s/chip through interval-graph SpMM propagation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The workload is the model's device hot loop (SURVEY.md §3.2): per step,
2 directions × gnn_layer hops × graph_num interval graphs of E edges each,
exactly as `_interval_propagation` runs it (gather + sorted segment-sum +
leaky-relu + residual), at gowalla-like scale but denser edges so the SpMM —
not the fusion — dominates.

vs_baseline: ratio against the recorded round-1 reference-path number in
BENCH_BASELINE.json (this repo's own anchor, since the reference publishes no
numbers — BASELINE.md). First run records itself as the anchor = 1.0.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Gowalla-like node counts (48,653 users; BASELINE.md), benchmark-scale edges.
GRAPH_NUM = 3
GNN_LAYER = 2
NUM_USERS = 49_152
NUM_ITEMS = 40_960
LATDIM = 64
EDGES_PER_INTERVAL = 4_000_000
ITERS = 20


def build_blocks(rng):
    """Padded edge blocks straight from a synthetic COO stream (sorted by
    target, like data.graph.compile_interval_graphs emits)."""
    u_src = np.empty((GRAPH_NUM, EDGES_PER_INTERVAL), np.int32)
    u_tgt = np.empty_like(u_src)
    i_src = np.empty_like(u_src)
    i_tgt = np.empty_like(u_src)
    for k in range(GRAPH_NUM):
        rows = rng.integers(0, NUM_USERS, EDGES_PER_INTERVAL,
                            dtype=np.int32)
        cols = rng.integers(0, NUM_ITEMS, EDGES_PER_INTERVAL,
                            dtype=np.int32)
        o = np.argsort(rows, kind="stable")
        u_tgt[k], u_src[k] = rows[o], cols[o]
        o = np.argsort(cols, kind="stable")
        i_tgt[k], i_src[k] = cols[o], rows[o]
    return u_src, u_tgt, i_src, i_tgt


def main() -> None:
    import jax
    import jax.numpy as jnp
    from sagnn_tpu.ops.segment import propagate

    dev = jax.devices()[0]
    log(f"device: {dev}")
    rng = np.random.default_rng(0)
    u_src, u_tgt, i_src, i_tgt = (jnp.asarray(x) for x in build_blocks(rng))
    key = jax.random.PRNGKey(0)
    u_emb = jax.random.normal(key, (GRAPH_NUM, NUM_USERS, LATDIM),
                              jnp.float32)
    i_emb = jax.random.normal(key, (GRAPH_NUM, NUM_ITEMS, LATDIM),
                              jnp.float32)

    @jax.jit
    def propagation(u_emb, i_emb):
        def one(_, inp):
            u0, i0, us, ut, isrc, itgt = inp
            embs0, embs1 = [u0], [i0]
            for _l in range(GNN_LAYER):
                a0 = propagate(embs1[-1], us, ut, NUM_USERS, 0.5)
                a1 = propagate(embs0[-1], isrc, itgt, NUM_ITEMS, 0.5)
                embs0.append(a0 + embs0[-1])
                embs1.append(a1 + embs1[-1])
            return None, (sum(embs0[1:], embs0[0]), sum(embs1[1:], embs1[0]))

        _, (uv, iv) = jax.lax.scan(one, None,
                                   (u_emb, i_emb, u_src, u_tgt, i_src, i_tgt))
        return uv, iv

    # warmup / compile
    out = propagation(u_emb, i_emb)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = propagation(u_emb, i_emb)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS

    edges_per_step = 2 * GNN_LAYER * GRAPH_NUM * EDGES_PER_INTERVAL
    edges_per_sec = edges_per_step / dt
    log(f"step time {dt*1e3:.2f} ms, {edges_per_sec/1e9:.3f} G edges/s")

    anchor_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_BASELINE.json")
    if os.path.exists(anchor_path):
        with open(anchor_path) as f:
            anchor = json.load(f)["edges_per_sec"]
    else:
        anchor = edges_per_sec
        with open(anchor_path, "w") as f:
            json.dump({"edges_per_sec": anchor,
                       "note": "round-1 XLA segment-sum reference path"}, f)
    print(json.dumps({
        "metric": "spmm_propagation_throughput",
        "value": round(edges_per_sec / 1e9, 4),
        "unit": "Gedges/s/chip",
        "vs_baseline": round(edges_per_sec / anchor, 4),
    }))


if __name__ == "__main__":
    main()
