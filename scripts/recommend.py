"""Batch inference CLI: top-k recommendations from a trained checkpoint.

The reference has no serving surface (it only ranks precomputed candidate
sets during eval); this is the production-inference entry point over
`SelfGNN.recommend_top_k` (full-catalog scoring + seen-item masking).

    python scripts/recommend.py --data synthetic --ckpt_root ./Models \
        --save_path tem --users 0 1 2 --k 10

Prints one JSON line per user: {"user", "items", "scores"}.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="synthetic")
    ap.add_argument("--data_dir", default="./Datasets")
    ap.add_argument("--ckpt_root", default="./Models")
    ap.add_argument("--save_path", default="tem")
    ap.add_argument("--users", type=int, nargs="+", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--include_seen", action="store_true")
    ap.add_argument("--recall", type=float, default=1.0,
                    help="top-k recall target (1.0 = exact; <1 trades "
                         "recall for throughput via approx_max_k)")
    ap.add_argument("--catalog_chunk", type=int, default=0,
                    help="stream the catalog in chunks of this many rows "
                         "(0 = auto: dense up to 131k rows per device, "
                         "chunked_topk past it; applies to both the "
                         "single-device and sharded paths)")
    ap.add_argument("--catalog_shards", type=int, default=0,
                    help="shard the item-encoding catalog over this many "
                         "devices ('model' mesh axis) and serve via the "
                         "distributed-MIPS path (parallel/serving.py); "
                         "0 = single-device recommend_top_k")
    ap.add_argument("--synth_users", type=int, default=2048,
                    help="--data synthetic: number of users (must match "
                         "the checkpointed run)")
    ap.add_argument("--synth_items", type=int, default=4096,
                    help="--data synthetic: number of items")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    from sagnn_tpu.config import Config, PRESETS
    from sagnn_tpu.data.io import load_dataset
    from sagnn_tpu.data.synthetic import synthetic_dataset
    from sagnn_tpu.train.checkpoint import CheckpointManager
    from sagnn_tpu.train.trainer import Trainer

    # the checkpoint carries its training Config (config.json) — the model
    # is rebuilt from it, so no architecture flags are needed here
    saved = CheckpointManager(args.ckpt_root, args.save_path).load_config()
    cfg = saved if saved is not None else PRESETS.get(args.data, Config())
    if cfg.model.spmm_backend == "ring":
        # the ring backend is a TRAINING layout (needs a multi-device mesh);
        # inference scores from the same params on any backend
        import dataclasses
        cfg = Config(model=dataclasses.replace(cfg.model,
                                               spmm_backend="xla"),
                     train=cfg.train, data=cfg.data)
    if args.data == "synthetic":
        bundle = synthetic_dataset(num_users=args.synth_users,
                                   num_items=args.synth_items,
                                   graph_num=cfg.model.graph_num,
                                   test_size=cfg.train.test_size,
                                   seed=cfg.train.seed)
    else:
        bundle = load_dataset(f"{args.data_dir}/{args.data}")
    if bundle.graph_num != cfg.model.graph_num:
        import dataclasses
        cfg = Config(model=dataclasses.replace(
            cfg.model, graph_num=bundle.graph_num),
            train=dataclasses.replace(cfg.train,
                                      save_path=args.save_path),
            data=cfg.data)
    tr = Trainer(cfg, bundle, ckpt_root=args.ckpt_root)
    state, _hist = tr.ckpt.restore(tr.state)
    if state is None:
        print(f"no checkpoint under {args.ckpt_root}/{args.save_path}",
              file=sys.stderr)
        sys.exit(1)
    tr.state = state

    users = np.asarray(args.users, np.int32)
    L = cfg.model.pos_length
    seq = np.zeros((len(users), L), np.int32)
    mask = np.zeros((len(users), L), np.float32)
    for i, u in enumerate(users):
        items = bundle.sequences[u][-L:]
        seq[i, L - len(items):] = items
        mask[i, L - len(items):] = 1.0

    if args.catalog_shards > 1:
        from sagnn_tpu.parallel.mesh import make_mesh
        from sagnn_tpu.parallel.serving import sharded_recommend_top_k
        mesh = make_mesh(data=1, model=args.catalog_shards)
        final_user, final_item, _, _ = tr.model.encode(
            tr.state["params"], tr.graphs, train=False)
        scores, items = sharded_recommend_top_k(
            tr.model, mesh, tr.state["params"], final_user, final_item,
            jnp.asarray(users), jnp.asarray(seq),
            jnp.asarray(mask), k=args.k,
            exclude_seen=not args.include_seen,
            recall_target=args.recall, chunk_rows=args.catalog_chunk)
    else:
        scores, items = tr.model.recommend_top_k(
            tr.state["params"], tr.graphs, jnp.asarray(users),
            jnp.asarray(seq), jnp.asarray(mask), k=args.k,
            exclude_seen=not args.include_seen, recall_target=args.recall,
            chunk_rows=args.catalog_chunk)
    scores, items = np.asarray(scores), np.asarray(items)
    for i, u in enumerate(users):
        print(json.dumps({"user": int(u),
                          "items": items[i].tolist(),
                          "scores": [round(float(s), 4)
                                     for s in scores[i]]}))


if __name__ == "__main__":
    main()
