"""Large-graph SpMM scaling benchmark (BASELINE.json config 5 analog).

Benches the out-of-core sliced Pallas SpMM on a synthetic power-law graph at
sizes beyond what a single materialized message stream allows. Multi-host
edge partitioning is validated separately on the CPU mesh
(tests/test_edge_partition.py); this script measures single-chip edges/s at
scale.

    python scripts/bench_large.py [--edges 32000000] [--slices 8]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=32_000_000)
    ap.add_argument("--users", type=int, default=400_000)
    ap.add_argument("--items", type=int, default=300_000)
    ap.add_argument("--slices", type=int, default=8)
    ap.add_argument("--latdim", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--src_shard_rows", type=int, default=0,
                    help="source-sharded gather path: rows per shard "
                         "(e.g. 131072 = 32 MB at D=64 f32); 0 = off")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from sagnn_tpu.ops.spmm_pallas import plan_spmm, spmm_apply, _plan_args

    rng = np.random.default_rng(0)
    print(f"building {args.edges/1e6:.0f}M-edge graph "
          f"({args.users} x {args.items})...", file=sys.stderr, flush=True)
    # zipf-ish targets/sources for realistic degree skew
    r = rng.pareto(1.3, args.edges)
    tgt = np.minimum((r / r.max() * args.users), args.users - 1).astype(
        np.int32)
    tgt = np.sort(rng.permutation(tgt))
    src = rng.integers(0, args.items, args.edges, dtype=np.int32)

    X = jax.random.normal(jax.random.PRNGKey(0),
                          (args.items, args.latdim), jnp.float32)
    t0 = time.time()
    if args.src_shard_rows:
        # source-sharded path: per-shard fast-path gathers (the XLA gather
        # emitter drops ~4x when the source operand exceeds ~32 MB)
        from sagnn_tpu.ops.spmm_pallas import (plan_spmm_src_sharded,
                                               spmm_apply_src_sharded)
        p = plan_spmm_src_sharded(src, tgt, args.users, args.items,
                                  args.src_shard_rows)
        slots = p["tgt_local"].shape[0] * p["tgt_local"].shape[1] \
            * p["tgt_local"].shape[2]
        print(f"sharded plan: {time.time()-t0:.1f}s, {p['num_shards']} "
              f"shards x {p['tgt_local'].shape[1]} chunks "
              f"(CS {p['tgt_local'].shape[2]}), pad waste "
              f"{(slots/args.edges - 1)*100:.0f}%",
              file=sys.stderr, flush=True)
        nb, nt, sr = p["num_blocks"], p["num_tgt"], p["shard_rows"]
        arrs = (jnp.asarray(p["src"]), jnp.asarray(p["tgt_local"]),
                jnp.asarray(p["chunk_block"]), jnp.asarray(p["chunk_first"]))
        fn = jax.jit(lambda x, s, tl, cb, cf: spmm_apply_src_sharded(
            x, s, tl, cb, cf, nb, nt, sr, exact=False).sum())
    else:
        plan = plan_spmm(src, tgt, args.users, num_slices=args.slices)
        print(f"plan: {time.time()-t0:.1f}s, {plan.num_chunks} chunks, "
              f"pad waste {(plan.num_chunks*plan.tgt_local.shape[-1]/args.edges - 1)*100:.0f}%",
              file=sys.stderr, flush=True)
        *arrs, nb, nt = _plan_args(plan)
        fn = jax.jit(lambda x, s, tl, cb, cf: spmm_apply(
            x, s, tl, cb, cf, nb, nt, exact=False,
            num_slices=args.slices).sum())
    # plan arrays must be jit ARGUMENTS, not closure constants — constants
    # get baked into the compile payload (hundreds of MB at this scale)
    v = float(fn(X, *arrs))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        v = float(fn(X, *arrs))
    dt = (time.perf_counter() - t0) / args.iters
    print(f"sliced spmm: {dt*1e3:.1f} ms/hop -> "
          f"{args.edges/dt/1e9:.3f} Gedges/s (v={v:.3e})",
          file=sys.stderr, flush=True)
    import json
    print(json.dumps({"metric": "large_graph_spmm", "edges": args.edges,
                      "value": round(args.edges / dt / 1e9, 4),
                      "unit": "Gedges/s/chip"}))


if __name__ == "__main__":
    main()
