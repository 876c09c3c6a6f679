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

    t0 = time.time()
    plan = plan_spmm(src, tgt, args.users, num_slices=args.slices)
    print(f"plan: {time.time()-t0:.1f}s, {plan.num_chunks} chunks, "
          f"pad waste {(plan.num_chunks*plan.tgt_local.shape[-1]/args.edges - 1)*100:.0f}%",
          file=sys.stderr, flush=True)
    *arrs, nb, nt = _plan_args(plan)

    X = jax.random.normal(jax.random.PRNGKey(0),
                          (args.items, args.latdim), jnp.float32)
    # plan arrays must be jit ARGUMENTS, not closure constants — constants
    # get baked into the compile payload (hundreds of MB at this scale)
    fn = jax.jit(lambda x, s, tl, cb, cf: spmm_apply(
        x, s, tl, cb, cf, nb, nt, exact=False,
        num_slices=args.slices).sum())
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
