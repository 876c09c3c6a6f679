"""Measure the EXECUTED reference's training throughput — the real
baseline anchor (VERDICT r1 missing #3).

Runs the original SA-GNN code (/root/reference) under the tf.compat.v1 +
contrib shim (scripts/tf1_shim.py) on a synthetic dataset from OUR
pipeline, times its per-step hot loop (host sampling + sess.run, ref
model.py:349-378), and then times sagnn_tpu's Trainer on the SAME data,
SAME hyperparameters, SAME hardware (CPU) — an apples-to-apples
same-host ratio. The TPU numbers in BENCH_*.json / STATUS.md then stack
on top of this measured reference anchor.

    python scripts/bench_reference.py [--users 2000] [--items 3000]
        [--steps 6] [--skip_ours]

Prints one JSON line:
  {"metric": "reference_train_throughput", "ref_step_seconds": ...,
   "ref_edges_per_sec": ..., "ours_cpu_step_seconds": ...,
   "ours_cpu_edges_per_sec": ..., "speedup_same_host": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import random
import sys
import tempfile
import time

import numpy as np
import scipy.sparse as sp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def write_reference_pickles(bundle, root: str, name: str) -> None:
    d = os.path.join(root, "Datasets", name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "trn_mat_time"), "wb") as f:
        pickle.dump([sp.csr_matrix(bundle.trn_mat),
                     [sp.csr_matrix(m) for m in bundle.sub_mats],
                     sp.csr_matrix(bundle.trn_mat)], f)
    with open(os.path.join(d, "tst_int"), "wb") as f:
        pickle.dump(list(bundle.tst_int), f)
    with open(os.path.join(d, "sequence"), "wb") as f:
        pickle.dump([list(s) for s in bundle.sequences], f)
    with open(os.path.join(d, "test_dict"), "wb") as f:
        pickle.dump(bundle.test_dict, f)


ARGS = {
    "--graphNum": "3", "--gnn_layer": "2", "--att_layer": "1",
    "--latdim": "64", "--num_attention_heads": "8", "--ssldim": "32",
    "--batch": "256", "--sslNum": "8", "--pos_length": "50",
    "--pred_num": "5", "--reg": "1e-2", "--ssl_reg": "1e-6",
    "--lr": "1e-3", "--decay": "0.96", "--keepRate": "1.0",
    "--leaky": "0.5", "--testSize": "20",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=2000)
    ap.add_argument("--items", type=int, default=3000)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--skip_ours", action="store_true")
    args_cli = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # never touch the TPU here
    from sagnn_tpu.data.synthetic import synthetic_dataset

    bundle = synthetic_dataset(num_users=args_cli.users,
                               num_items=args_cli.items, graph_num=3,
                               seq_len_range=(8, 60), test_size=20,
                               seed=17)
    total_edges = int(sum(m.nnz for m in bundle.sub_mats))
    g, layers = int(ARGS["--graphNum"]), int(ARGS["--gnn_layer"])
    # device hot-loop edges per step: 2 dirs x layers x all interval edges
    edges_per_step = 2 * layers * total_edges
    log(f"dataset: {args_cli.users} users, {args_cli.items} items, "
        f"{total_edges} interval edges, {edges_per_step} edges/step")

    tmp = tempfile.mkdtemp(prefix="ref_bench_")
    write_reference_pickles(bundle, tmp, "tiny")
    cwd = os.getcwd()
    os.chdir(tmp)

    import tf1_shim
    tf = tf1_shim.install()
    sys.path.insert(0, "/root/reference")
    sys.argv = ["main.py"] + [t for kv in
                              {**ARGS, "--data": "tiny",
                               "--trnNum": str(args_cli.users)}.items()
                              for t in kv]
    np.random.seed(100)
    random.seed(100)
    tf.set_random_seed(100)

    from Params import args  # noqa: E402
    from DataHandler import DataHandler  # noqa: E402
    from model import Recommender  # noqa: E402

    handler = DataHandler()
    handler.LoadData()
    sess = tf.Session()
    rec = Recommender(sess, handler)
    rec.prepareModel()
    sess.run(tf.global_variables_initializer())

    # the reference per-step hot loop (model.py:349-378): sample + sess.run
    def ref_step(bat_ids):
        uL, iL, seqs, msk, uLs = rec.sampleTrainBatch(
            bat_ids, handler.trnMat, handler.timeMat, 40)
        su, si, _ = rec.sampleSslBatch(bat_ids, handler.subMat, False)
        feed = {rec.uids: uL, rec.iids: iL, rec.sequence: seqs,
                rec.mask: msk, rec.uLocs_seq: uLs, rec.keepRate: 1.0,
                rec.is_train: True}
        for k in range(args.graphNum):
            feed[rec.suids[k]] = su[k]
            feed[rec.siids[k]] = si[k]
        return sess.run([rec.optimizer, rec.preLoss], feed_dict=feed)[1]

    ids = np.random.permutation(args.user)
    B = args.batch
    ref_step(ids[:B])  # warmup (graph finalization etc.)
    t0 = time.perf_counter()
    for s in range(args_cli.steps):
        bat = ids[(s * B) % max(1, len(ids) - B):][:B]
        ref_step(bat)
    ref_dt = (time.perf_counter() - t0) / args_cli.steps
    log(f"reference (TF1 shim, CPU): {ref_dt*1e3:.1f} ms/step, "
        f"{edges_per_step/ref_dt/1e6:.2f} Medges/s")
    os.chdir(cwd)

    out = {
        "metric": "reference_train_throughput",
        "users": args_cli.users, "items": args_cli.items,
        "interval_edges": total_edges,
        "edges_per_step": edges_per_step,
        "ref_step_seconds": round(ref_dt, 4),
        "ref_edges_per_sec": round(edges_per_step / ref_dt),
    }

    if not args_cli.skip_ours:
        from sagnn_tpu.config import Config, DataConfig, ModelConfig, \
            TrainConfig
        from sagnn_tpu.train.trainer import Trainer

        cfg = Config(
            model=ModelConfig(graph_num=3, gnn_layer=2, att_layer=1,
                              latdim=64, num_heads=8, ssldim=32,
                              pos_length=50, keep_rate=1.0,
                              spmm_backend="xla"),
            train=TrainConfig(lr=1e-3, batch=256, reg=1e-2, ssl_reg=1e-6,
                              samp_num=40, ssl_num=8, pred_num=5,
                              trn_num=args_cli.users, test_size=20),
            data=DataConfig(data="synthetic"),
        )
        tr = Trainer(cfg, bundle, ckpt_root=tempfile.mkdtemp())
        tr.train_epoch(verbose=False)  # includes compile
        t0 = time.perf_counter()
        tr.train_epoch(verbose=False)
        steps = tr._steps_last_epoch
        ours_dt = (time.perf_counter() - t0) / steps
        log(f"sagnn_tpu (XLA backend, CPU): {ours_dt*1e3:.1f} ms/step, "
            f"{edges_per_step/ours_dt/1e6:.2f} Medges/s")
        out.update({
            "ours_cpu_step_seconds": round(ours_dt, 4),
            "ours_cpu_edges_per_sec": round(edges_per_step / ours_dt),
            "speedup_same_host": round(ref_dt / ours_dt, 2),
        })

    print(json.dumps(out))


if __name__ == "__main__":
    main()
