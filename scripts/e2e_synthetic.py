"""End-to-end training validation on a synthetic gowalla-scale dataset.

Runs the full trainer (native sampler + pallas SpMM + prefetch overlap) for a
few epochs and reports quality + throughput. Usage:

    python scripts/e2e_synthetic.py [--epochs 6] [--users 20000]
        [--backend pallas|xla]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from sagnn_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from sagnn_tpu.data.synthetic import synthetic_dataset
from sagnn_tpu.train.trainer import Trainer
from sagnn_tpu.utils.logger import log


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--users", type=int, default=20000)
    ap.add_argument("--items", type=int, default=12000)
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--graph_num", type=int, default=3)
    ap.add_argument("--tst_epoch", type=int, default=2)
    ap.add_argument("--fold", action="store_true",
                    help="row-folded gathers (spmm_fold_gather)")
    args = ap.parse_args()

    cfg = Config(
        model=ModelConfig(graph_num=args.graph_num, gnn_layer=2, att_layer=1,
                          ssldim=48, spmm_backend=args.backend,
                          spmm_exact=False, keep_rate=0.5,
                          spmm_fold_gather=args.fold),
        train=TrainConfig(lr=2e-3, reg=1e-2, ssl_reg=1e-6, epoch=args.epochs,
                          batch=512, samp_num=40, ssl_num=40, trn_num=10000,
                          test_size=100, tst_epoch=args.tst_epoch,
                          save_path="e2e_synth"),
        data=DataConfig(data="synthetic"),
    )
    t0 = time.time()
    bundle = synthetic_dataset(num_users=args.users, num_items=args.items,
                               graph_num=args.graph_num,
                               seq_len_range=(8, 80),
                               test_size=cfg.train.test_size, seed=0)
    log(f"synthetic dataset: {time.time()-t0:.1f}s, "
        f"{sum(m.nnz for m in bundle.sub_mats)} interval edges")

    t0 = time.time()
    tr = Trainer(cfg, bundle, ckpt_root="/tmp/e2e_models")
    log(f"trainer built: {time.time()-t0:.1f}s "
        f"(E_pad={tr.graph_blocks.edges_padded})")

    first_hr = last_hr = None
    for ep in range(args.epochs):
        t0 = time.time()
        stats = tr.train_epoch(verbose=False)
        dt = time.time() - t0
        tp = tr.throughput_stats()
        log(f"epoch {ep}: loss={stats['Loss']:.3f} "
            f"preLoss={stats['preLoss']:.3f} wall={dt:.1f}s "
            f"step={tp['step_ms_mean']:.0f}ms "
            f"edges/s={tp['edges_per_sec']/1e6:.1f}M")
        if ep % args.tst_epoch == 0 or ep == args.epochs - 1:
            mets = tr.test_epoch()
            log(f"  test: HR@10={mets['HR']:.4f} NDCG@10={mets['NDCG']:.4f}")
            if first_hr is None:
                first_hr = mets["HR"]
            last_hr = mets["HR"]
    log(f"HR@10 {first_hr:.4f} -> {last_hr:.4f} "
        f"({'improved' if last_hr > first_hr else 'NOT improved'})")


if __name__ == "__main__":
    main()
