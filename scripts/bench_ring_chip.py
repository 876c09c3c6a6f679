"""Bound the ring backend's wrapping overhead ON THE REAL CHIP.

Multi-chip hardware is unavailable in this image, so the distributed ring
backend (shard_map + ppermute + per-bucket Pallas plans) normally only runs
on CPU meshes. A DEGENERATE model=1 mesh on the single TPU chip executes
the full shard_map/ring machinery (ppermute over one device is identity)
against the same one-hot-matmul kernels — the step-time difference vs the
plain single-chip pallas backend is the ring's wrapping cost (shard_map
lowering, per-bucket plan indexing, scan over ring steps, bucket padding).

Both backends run the PRODUCTION forward path (SelfGNN.encode via a
Trainer, exactly what a train step executes per interval) with chained
data-dependent dispatches inside one jit — per-step epoch averages through
the relay vary ~2x run-to-run (measured 95.7 vs 190.8 ms for identical
pallas runs), so single-dispatch timings are not honest here.

Usage: python scripts/bench_ring_chip.py [--users 20480] [--iters 8]
Prints one JSON line with the overhead ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN = 4


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=20_480)
    ap.add_argument("--items", type=int, default=12_288)
    ap.add_argument("--graph_num", type=int, default=3)
    ap.add_argument("--iters", type=int, default=8)
    ns = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from sagnn_tpu.config import Config, ModelConfig, TrainConfig
    from sagnn_tpu.data.synthetic import synthetic_dataset
    from sagnn_tpu.train.trainer import Trainer

    bundle = synthetic_dataset(num_users=ns.users, num_items=ns.items,
                               graph_num=ns.graph_num, test_size=20, seed=3,
                               seq_len_range=(10, 50))

    def make(backend, mesh=None):
        cfg = Config(
            model=ModelConfig(graph_num=ns.graph_num, gnn_layer=2,
                              att_layer=1, latdim=64, num_heads=8,
                              ssldim=48, pos_length=50,
                              spmm_backend=backend),
            train=TrainConfig(batch=256, samp_num=4, ssl_num=4,
                              trn_num=1024, test_size=20),
        )
        return Trainer(cfg, bundle, ckpt_root="/tmp/bench_ring_chip",
                       mesh=mesh)

    def timeit(model, params, graphs):
        @jax.jit
        def chained(p, g):
            def body(c, _):
                fu, fi, _, _ = model.encode(
                    jax.tree_util.tree_map(lambda a: a + c * 1e-12, p), g)
                return c * 1e-20 + fu.sum() + fi.sum(), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
            return c

        v = float(chained(params, graphs))   # compile + warmup
        t0 = time.perf_counter()
        for _ in range(ns.iters):
            v = float(chained(params, graphs))
        return (time.perf_counter() - t0) / ns.iters / CHAIN

    tr_a = make("pallas")
    dt_pl = timeit(tr_a.model, tr_a.state["params"], tr_a.graphs)
    print(f"pallas encode: {dt_pl*1e3:.2f} ms", file=sys.stderr)

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    tr_b = make("ring", mesh=mesh)
    with mesh:
        dt_ring = timeit(tr_b.model, tr_b.state["params"], tr_b.graphs)
    print(f"ring(P=1) encode: {dt_ring*1e3:.2f} ms", file=sys.stderr)

    print(json.dumps({
        "metric": "ring_backend_chip_overhead",
        "pallas_encode_ms": round(dt_pl * 1e3, 2),
        "ring_p1_encode_ms": round(dt_ring * 1e3, 2),
        "overhead": round(dt_ring / dt_pl - 1.0, 4),
        "users": ns.users, "items": ns.items,
        "graph_num": ns.graph_num,
    }))


if __name__ == "__main__":
    main()
