"""Quality parity on identical data: train BOTH the executed TF1 reference
(shim, CPU) and sagnn_tpu on the same synthetic dataset and compare
best HR@10/NDCG@10 (VERDICT r1 missing #4 — turns "synthetic converges"
into "synthetic converges to the same numbers the reference gets on the
same data").

Real pickles don't ship in /root/reference (only tst_int), so the dataset
is our generator's, shaped like a scaled-down version of the chosen
preset (--preset gowalla|movielens|yelp|amazon: graphNum/gnn_layer/
att_layer/ssldim/lr/ssl_reg verbatim from the launch scripts;
batch/testSize/pos_length/sslNum scaled down ~5x with the user count).
Both sides use identical configs, the same eval protocol (testSize
candidates, 1 positive), and their own samplers (sampling is random
either way; parity is the converged metric level, not the trajectory).

    python scripts/parity_quality.py [--preset gowalla] [--users 3000]
        [--items 2500] [--epochs 30]

Prints one JSON line {"ref": {...}, "ours": {...}, "config": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import random
import sys
import tempfile

import numpy as np
import scipy.sparse as sp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Launch-script hyperparameters at reduced scale, per preset
# (lr/reg/ssl_reg/ssldim/graphNum/gnn_layer/att_layer/keepRate/pred_num
# verbatim from the .sh files, EXCEPT gowalla's keepRate: gowalla.sh does
# not set it and the reference default is 0.5 (Params.py:31); 1.0 is a
# deliberate deviation carried over from the round-1 comparison — both
# sides get the same value, so the comparison stays internally fair.
# batch/testSize/pos_length/sslNum scale with the ~5x-smaller user count.
# BASE_HP mirrors gowalla's round-2 recorded row; per-preset dicts
# override the architecture knobs.
BASE_HP = {
    "--latdim": "64", "--num_attention_heads": "8",
    "--batch": "256", "--pos_length": "50",
    "--reg": "1e-2", "--decay": "0.96", "--leaky": "0.5",
    "--testSize": "100", "--tstEpoch": "3",
}
PRESET_HP = {
    # gowalla.sh:1
    "gowalla": {"--graphNum": "3", "--gnn_layer": "2", "--att_layer": "1",
                "--ssldim": "48", "--lr": "2e-3", "--ssl_reg": "1e-6",
                "--sslNum": "8", "--pred_num": "5", "--keepRate": "1.0"},
    # movielens.sh:1 (sslNum 90 -> 18)
    "movielens": {"--graphNum": "6", "--gnn_layer": "2", "--att_layer": "3",
                  "--ssldim": "48", "--lr": "1e-3", "--ssl_reg": "1e-6",
                  "--sslNum": "18", "--pred_num": "5", "--keepRate": "0.5"},
    # yelp.sh:1 (sslNum 40 -> 8)
    "yelp": {"--graphNum": "12", "--gnn_layer": "3", "--att_layer": "2",
             "--ssldim": "32", "--lr": "1e-3", "--ssl_reg": "1e-7",
             "--sslNum": "8", "--pred_num": "5", "--keepRate": "0.5"},
    # amazon.sh:1 (sslNum 80 -> 16; pred_num 0)
    "amazon": {"--graphNum": "5", "--gnn_layer": "3", "--att_layer": "4",
               "--ssldim": "32", "--lr": "1e-3", "--ssl_reg": "1e-6",
               "--sslNum": "16", "--pred_num": "0", "--keepRate": "0.5"},
}
HP = dict(BASE_HP)  # completed in main() from --preset


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


def run_reference(bundle, epochs: int, trn_num: int) -> dict:
    tmp = tempfile.mkdtemp(prefix="parity_ref_")
    write_reference_pickles(bundle, tmp, "tiny")
    cwd = os.getcwd()
    os.chdir(tmp)
    import tf1_shim
    tf = tf1_shim.install()
    sys.path.insert(0, "/root/reference")
    sys.argv = ["main.py"] + [t for kv in
                              {**HP, "--data": "tiny",
                               "--trnNum": str(trn_num)}.items()
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
    best = {"HR": 0.0, "NDCG": 0.0, "epoch": -1}
    for ep in range(epochs):
        tr = rec.trainEpoch()
        if ep % args.tstEpoch == 0 or ep == epochs - 1:
            te = rec.testEpoch()
            log(f"ref epoch {ep}: loss {tr['Loss']:.3f} "
                f"HR {te['HR']:.4f} NDCG {te['NDCG']:.4f}")
            if te["NDCG"] > best["NDCG"]:
                best = {"HR": float(te["HR"]), "NDCG": float(te["NDCG"]),
                        "epoch": ep}
    os.chdir(cwd)
    return best


def run_ours(bundle, epochs: int, trn_num: int) -> dict:
    from sagnn_tpu.config import Config, DataConfig, ModelConfig, \
        TrainConfig
    from sagnn_tpu.train.trainer import Trainer

    hp = {k.lstrip("-"): v for k, v in HP.items()}  # same dict the ref gets
    cfg = Config(
        model=ModelConfig(graph_num=int(hp["graphNum"]),
                          gnn_layer=int(hp["gnn_layer"]),
                          att_layer=int(hp["att_layer"]),
                          latdim=int(hp["latdim"]),
                          num_heads=int(hp["num_attention_heads"]),
                          ssldim=int(hp["ssldim"]),
                          pos_length=int(hp["pos_length"]),
                          keep_rate=float(hp["keepRate"]),
                          leaky=float(hp["leaky"]), spmm_backend="xla"),
        train=TrainConfig(lr=float(hp["lr"]), batch=int(hp["batch"]),
                          reg=float(hp["reg"]), ssl_reg=float(hp["ssl_reg"]),
                          samp_num=40, ssl_num=int(hp["sslNum"]),
                          pred_num=int(hp["pred_num"]),
                          trn_num=trn_num, test_size=int(hp["testSize"]),
                          tst_epoch=int(hp["tstEpoch"]), epoch=epochs),
        data=DataConfig(data="synthetic"),
    )
    tr = Trainer(cfg, bundle, ckpt_root=tempfile.mkdtemp())
    best = {"HR": 0.0, "NDCG": 0.0, "epoch": -1}
    for ep in range(epochs):
        out = tr.train_epoch(verbose=False)
        if ep % cfg.train.tst_epoch == 0 or ep == epochs - 1:
            te = tr.test_epoch()
            log(f"ours epoch {ep}: loss {out['Loss']:.3f} "
                f"HR {te['HR']:.4f} NDCG {te['NDCG']:.4f}")
            if te["NDCG"] > best["NDCG"]:
                best = {"HR": float(te["HR"]), "NDCG": float(te["NDCG"]),
                        "epoch": ep}
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESET_HP), default="gowalla")
    ap.add_argument("--users", type=int, default=3000)
    ap.add_argument("--items", type=int, default=2500)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--skip_ref", action="store_true")
    args_cli = ap.parse_args()
    HP.update(PRESET_HP[args_cli.preset])

    import jax
    jax.config.update("jax_platforms", "cpu")  # CPU only, never the TPU
    from sagnn_tpu.data.synthetic import synthetic_dataset

    bundle = synthetic_dataset(num_users=args_cli.users,
                               num_items=args_cli.items,
                               graph_num=int(HP["--graphNum"]),
                               seq_len_range=(8, 60), test_size=100,
                               seed=23)
    trn_num = args_cli.users

    ours = run_ours(bundle, args_cli.epochs, trn_num)
    ref = None
    if not args_cli.skip_ref:
        ref = run_reference(bundle, args_cli.epochs, trn_num)

    print(json.dumps({
        "metric": "quality_parity_same_data",
        "preset": args_cli.preset,
        "users": args_cli.users, "items": args_cli.items,
        "epochs": args_cli.epochs, "test_candidates": 100,
        "ref": ref, "ours": ours,
    }))


if __name__ == "__main__":
    main()
