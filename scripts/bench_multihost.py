"""True multi-PROCESS distributed-SpMM run (the BASELINE.json "N>=2 hosts"
row, demonstrable in this image): N separate processes, each owning local
devices, joined by `jax.distributed.initialize` into one global mesh; the
ring edge-partitioned SpMM's ppermutes cross process boundaries over the
Gloo transport (stand-in for ICI/DCN on a real pod slice).

Launcher mode (default) spawns the workers and reports; on a real TPU pod
each host runs the worker directly (parallel.launch.initialize_distributed
picks up the TPU coordinator automatically).

    python scripts/bench_multihost.py [--procs 2] [--edges 2000000]

Prints one JSON line: edges/s at N processes + correctness checksum.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

# default coordinator port; the launcher picks a FREE port and passes it
# to workers, so two launchers (e.g. pytest -n, or a bench run next to a
# test run) cannot collide on the coordinator socket
PORT = 45813


def worker_train(args):
    """One-epoch END-TO-END Trainer run across N processes: per-host
    sampler shards (Trainer._assemble_global_batch) + GSPMD train step over
    the global mesh. The sampler determinism contract makes the global
    batch — and therefore the losses — identical to a single-process run
    on the same mesh shape (asserted by tests/test_multihost.py)."""
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count="
                               f"{args.local_devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from sagnn_tpu.parallel.launch import initialize_distributed
    initialize_distributed(coordinator_address=f"localhost:{PORT}",
                           num_processes=args.procs,
                           process_id=args.proc_id)
    from sagnn_tpu.config import Config, ModelConfig, TrainConfig
    from sagnn_tpu.data.synthetic import synthetic_dataset
    from sagnn_tpu.parallel.mesh import make_mesh
    from sagnn_tpu.train.trainer import Trainer

    bundle = synthetic_dataset(num_users=48, num_items=64, graph_num=2,
                               test_size=10, seed=2)
    cfg = Config(
        model=ModelConfig(graph_num=2, gnn_layer=1, att_layer=1, latdim=16,
                          num_heads=4, ssldim=8, pos_length=16,
                          keep_rate=1.0),
        train=TrainConfig(batch=16, samp_num=4, ssl_num=2, trn_num=32,
                          test_size=10, lr=5e-3),
    )
    mesh = make_mesh(data=jax.device_count(), model=1)
    tr = Trainer(cfg, bundle, ckpt_root=f"/tmp/mh_models_{args.proc_id}",
                 mesh=mesh)
    t0 = time.perf_counter()
    out = tr.train_epoch(verbose=False)
    dt = time.perf_counter() - t0
    mets = tr.test_epoch()
    # full-sort eval under the same per-host batch sharding (round 3:
    # eval scales like training — each host samples only its slice)
    fs = tr.test_epoch(full_sort=True)
    if args.proc_id == 0:
        print(json.dumps({
            "metric": "multihost_train_epoch",
            "processes": args.procs,
            "global_devices": jax.device_count(),
            "Loss": out["Loss"], "preLoss": out["preLoss"],
            "HR": mets["HR"], "NDCG": mets["NDCG"],
            "fs_HR": fs["HR"], "fs_NDCG": fs["NDCG"],
            "epoch_seconds": round(dt, 2),
        }), flush=True)


def worker(args):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count="
                               f"{args.local_devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from sagnn_tpu.parallel.launch import initialize_distributed
    initialize_distributed(coordinator_address=f"localhost:{PORT}",
                           num_processes=args.procs,
                           process_id=args.proc_id)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from sagnn_tpu.parallel.edge_partition import (
        pad_node_table_rows, partition_edges_ring, ring_spmm_arrays)

    P_ = jax.device_count()
    mesh = Mesh(np.array(jax.devices()), ("model",))

    rng = np.random.default_rng(0)   # identical graph on every process
    E, U, I, D = args.edges, args.users, args.items, args.latdim
    tgt = np.sort(rng.integers(0, U, E, dtype=np.int32))
    src = rng.integers(0, I, E, dtype=np.int32)
    X = rng.standard_normal((I, D)).astype(np.float32)
    parts = partition_edges_ring(src, tgt, I, U, P_)
    Xp = pad_node_table_rows(X, P_, parts.src_rows_per_shard)
    sh = NamedSharding(mesh, P("model", None))
    x = jax.make_array_from_callback(Xp.shape, sh, lambda idx: Xp[idx])
    src_l = jnp.asarray(parts.src_local)
    tgt_l = jnp.asarray(parts.tgt_local)

    # partitions ride as jit ARGUMENTS, not closure constants: constants go
    # into the remote-compile payload (HTTP 413 past ~100 MB at pod-scale E)
    fn = jax.jit(
        lambda xx, sl, tl: ring_spmm_arrays(mesh, xx, sl, tl,
                                            parts.rows_per_shard)[:U].sum(),
        out_shardings=NamedSharding(mesh, P()))
    v = float(fn(x, src_l, tgt_l))   # compile + warmup
    iters = args.iters
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(x, src_l, tgt_l))
    dt = (time.perf_counter() - t0) / iters

    if args.proc_id == 0:
        expect = np.zeros((U, D), np.float32)
        np.add.at(expect, tgt, X[src])
        ok = abs(v - float(expect.sum())) < 1e-2 * max(1.0, abs(v))
        print(json.dumps({
            "metric": "multihost_ring_spmm",
            "processes": args.procs,
            "global_devices": P_,
            "edges_per_sec": round(E / dt),
            "checksum_ok": bool(ok),
        }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--local_devices", type=int, default=2)
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument("--users", type=int, default=100_000)
    ap.add_argument("--items", type=int, default=80_000)
    ap.add_argument("--latdim", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--mode", choices=["spmm", "train"], default="spmm",
                    help="spmm: ring SpMM microbench; train: one-epoch "
                         "end-to-end Trainer run with per-host sampling")
    ap.add_argument("--proc_id", type=int, default=-1,
                    help="internal: worker mode")
    ap.add_argument("--port", type=int, default=0,
                    help="coordinator port (0 = launcher picks a free one)")
    args = ap.parse_args()

    if args.proc_id >= 0:
        global PORT
        PORT = args.port or PORT
        (worker_train if args.mode == "train" else worker)(args)
        return

    port = args.port
    if not port:
        import socket
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]

    procs = []
    for i in range(args.procs):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--proc_id", str(i), "--mode", args.mode,
               "--port", str(port)]
        for k in ("procs", "local_devices", "edges", "users", "items",
                  "latdim", "iters"):
            cmd += [f"--{k}", str(getattr(args, k))]
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE if i == 0 else subprocess.DEVNULL,
            stderr=(None if os.environ.get("MH_DEBUG") else
                    subprocess.DEVNULL), cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))))
    out, _ = procs[0].communicate(timeout=600)
    for p in procs[1:]:
        p.wait(timeout=60)
    sys.stdout.write(out.decode())
    sys.exit(max(p.returncode for p in procs))


if __name__ == "__main__":
    main()
