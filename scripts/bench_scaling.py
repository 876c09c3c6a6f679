"""Distributed-SpMM scaling benchmark (BASELINE.json: edges/s at 1 chip /
1 host / >=2 hosts; scaling-efficiency target >=80%).

Measures one propagation hop over an edge-partitioned synthetic bipartite
graph at shard counts 1/2/4/8 with both exchange strategies:

  allgather — monolithic boundary exchange, then local SpMM
  ring      — ppermute ring, exchange overlapped with per-bucket aggregation

On this image only virtual CPU devices exist
(XLA_FLAGS=--xla_force_host_platform_device_count=8), so absolute numbers are
NOT TPU-representative; the same script runs unchanged on a real slice (drop
the env forcing, launch one process per host via parallel.launch). Efficiency
= edges/s(P) / (P * edges/s(1)).

    python scripts/bench_scaling.py [--edges 4000000] [--latdim 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=4_000_000)
    ap.add_argument("--users", type=int, default=200_000)
    ap.add_argument("--items", type=int, default=160_000)
    ap.add_argument("--latdim", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu", action="store_true", default=True,
                    help="force the 8-device virtual CPU mesh (default; "
                    "pass --no-cpu on a real multi-chip slice)")
    ap.add_argument("--no-cpu", dest="cpu", action="store_false")
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sagnn_tpu.parallel.edge_partition import (
        build_ring_bucket_plans, edge_partitioned_spmm, pad_node_table,
        pad_node_table_rows, partition_edges_by_target, partition_edges_ring,
        ring_edge_partitioned_spmm, ring_spmm_pallas_arrays,
    )
    from sagnn_tpu.parallel.mesh import make_mesh

    ndev = jax.device_count()
    rng = np.random.default_rng(0)
    E, U, I, D = args.edges, args.users, args.items, args.latdim
    tgt = np.sort(rng.integers(0, U, E, dtype=np.int32))
    src = rng.integers(0, I, E, dtype=np.int32)
    X = rng.standard_normal((I, D)).astype(np.float32)

    def timeit(fn, *a):
        v = float(fn(*a))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            v = float(fn(*a))
        del v
        return (time.perf_counter() - t0) / args.iters

    results = {}
    shard_counts = [p for p in (1, 2, 4, 8) if p <= ndev]
    for variant in ("allgather", "ring", "ring_pallas"):
        per = {}
        for p in shard_counts:
            mesh = make_mesh(data=1, model=p,
                             devices=jax.devices()[:p])
            sh = NamedSharding(mesh, P("model", None))
            if variant == "allgather":
                parts = partition_edges_by_target(src, tgt, U, p)
                x = jax.device_put(jnp.asarray(pad_node_table(X, p)), sh)
                fn = jax.jit(lambda xx, m=mesh, pp=parts:
                             edge_partitioned_spmm(m, xx, pp).sum())
            elif variant == "ring":
                parts = partition_edges_ring(src, tgt, I, U, p)
                x = jax.device_put(jnp.asarray(pad_node_table_rows(
                    X, p, parts.src_rows_per_shard)), sh)
                fn = jax.jit(lambda xx, m=mesh, pp=parts:
                             ring_edge_partitioned_spmm(m, xx, pp).sum())
            else:
                # pallas segment-sum per bucket (the model's default ring)
                parts = partition_edges_ring(src, tgt, I, U, p)
                plan = build_ring_bucket_plans(parts)
                nb = plan.pop("num_blocks")
                pa = tuple(jnp.asarray(plan[k]) for k in
                           ("src", "tgt_local", "chunk_block",
                            "chunk_first"))
                rows = parts.rows_per_shard
                x = jax.device_put(jnp.asarray(pad_node_table_rows(
                    X, p, parts.src_rows_per_shard)), sh)
                fn = jax.jit(lambda xx, m=mesh, a=pa, r=rows, n=nb:
                             ring_spmm_pallas_arrays(
                                 m, xx, *a, r, n).sum())
            with mesh:
                dt = timeit(fn, x)
            per[p] = E / dt
            eff = per[p] / (p * per[shard_counts[0]])
            print(f"{variant:9s} P={p}: {E/dt/1e9:.3f} Gedges/s "
                  f"(eff {eff*100:.0f}%)", file=sys.stderr, flush=True)
        results[variant] = {
            "edges_per_sec": per,
            "efficiency": {p: per[p] / (p * per[1]) for p in per},
        }

    print(json.dumps({
        "metric": "distributed_spmm_scaling",
        "devices": ndev,
        "backend": jax.default_backend(),
        "results": {v: {"edges_per_sec": {str(k): round(x) for k, x in
                                          r["edges_per_sec"].items()},
                        "efficiency": {str(k): round(x, 3) for k, x in
                                       r["efficiency"].items()}}
                    for v, r in results.items()},
    }))


if __name__ == "__main__":
    main()
