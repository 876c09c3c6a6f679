"""CLI entry point (ref: main.py + Params.py).

    python main.py --data gowalla            # use the gowalla preset
    python main.py --data yelp --lr 1e-3 ... # preset + overrides
    python main.py --data synthetic          # built-in synthetic dataset

Flags mirror the reference's live argparse surface; dead reference flags are
dropped (SURVEY.md §5 config notes).
"""

from __future__ import annotations

import argparse
import dataclasses
import os

from sagnn_tpu.config import Config, DataConfig, ModelConfig, PRESETS, TrainConfig
from sagnn_tpu.data.io import load_dataset
from sagnn_tpu.data.synthetic import synthetic_dataset
from sagnn_tpu.train.trainer import Trainer
from sagnn_tpu.utils.logger import log


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="sagnn_tpu")
    p.add_argument("--data", default="yelp")
    p.add_argument("--data_dir", default="./Datasets")
    p.add_argument("--lr", type=float)
    p.add_argument("--batch", type=int)
    p.add_argument("--reg", type=float)
    p.add_argument("--epoch", type=int)
    p.add_argument("--graphNum", type=int, dest="graph_num")
    p.add_argument("--decay", type=float)
    p.add_argument("--save_path")
    p.add_argument("--latdim", type=int)
    p.add_argument("--ssldim", type=int)
    p.add_argument("--sampNum", type=int, dest="samp_num")
    p.add_argument("--testSize", type=int, dest="test_size")
    p.add_argument("--sslNum", type=int, dest="ssl_num")
    p.add_argument("--num_attention_heads", type=int, dest="num_heads")
    p.add_argument("--gnn_layer", type=int)
    p.add_argument("--trnNum", type=int, dest="trn_num")
    p.add_argument("--load_model")
    p.add_argument("--import_tf1",
                   help="prefix of a reference tf.train.Saver checkpoint "
                        "(its Models/<save_path>) to import weights + Adam "
                        "moments + global step from (migration path; "
                        "requires the tensorflow CPU wheel as reader)")
    p.add_argument("--shoot", type=int)
    p.add_argument("--keepRate", type=float, dest="keep_rate")
    p.add_argument("--tstEpoch", type=int, dest="tst_epoch")
    p.add_argument("--leaky", type=float)
    p.add_argument("--ssl_reg", type=float)
    p.add_argument("--percent", type=float, default=0.0)
    p.add_argument("--pos_length", type=int)
    p.add_argument("--att_layer", type=int)
    p.add_argument("--pred_num", type=int)
    p.add_argument("--test", type=lambda s: s.lower() != "false",
                   dest="test_mode", default=None)
    p.add_argument("--seed", type=int)
    p.add_argument("--ckpt_root", default="./Models")
    p.add_argument("--uid", type=int, default=-1,
                   help="dump this test-batch row's candidate scores "
                   "(reference --uid debug mode, model.py:460-461)")
    # TPU-native extensions (no reference analog)
    p.add_argument("--spmm_backend", choices=["xla", "pallas", "ring"],
                   help="propagation backend (ring needs --mesh_model > 1)")
    p.add_argument("--spmm_chunk_size", type=int,
                   help="pallas plan edges/chunk (default 0 = auto-select "
                        "from the graph's block-fill histogram)")
    p.add_argument("--spmm_fold_gather", action="store_true", default=None,
                   help="row-folded exact-f32 gathers: read node tables "
                        "through an [N/2, 2D] view (zero-lane-pad relayout "
                        "copy, the 1M-node exact-mode memory lever); "
                        "in-kernel half-select")
    p.add_argument("--spmm_src_shard_rows", type=int,
                   help="source-sharded pallas SpMM for huge node tables "
                        "(0 = auto past the ~32 MB gather cliff, -1 = off, "
                        ">0 = rows per source shard)")
    p.add_argument("--edge_norm", choices=["sym_sqrt", "mean"],
                   help="normalized propagation (non-parity): sym-sqrt "
                   "GCN-style or target-degree mean aggregation")
    p.add_argument("--edge_dropout_keep", type=float,
                   help="functional edge dropout keep rate (non-parity Q1 "
                   "variant; 1.0 = off, needs xla or pallas backend)")
    p.add_argument("--edge_attention", action="store_true", default=None,
                   help="GAT-style edge-attention propagation (non-parity; "
                   "needs --spmm_backend pallas)")
    p.add_argument("--per_token_seq_attention", action="store_true",
                   default=None,
                   help="true per-token masked sequence attention instead "
                   "of the reference's pooled-token branch (non-parity, "
                   "quirk Q3 fix)")
    p.add_argument("--seq_parallel", action="store_true", default=None,
                   help="ring-attention sequence parallelism for the "
                   "per-token sequence branch (non-parity; needs "
                   "--per_token_seq_attention and mesh_model > 1)")
    p.add_argument("--full_sort", action="store_true", default=None,
                   help="evaluate by ranking the positive against the FULL "
                   "catalog (minus the user's history) instead of the "
                   "999-precomputed-negative protocol")
    p.add_argument("--fusion_dtype", choices=["f32", "bf16"],
                   help="temporal-fusion/attention compute dtype")
    p.add_argument("--bf16", action="store_true", default=None,
                   help="throughput mode (non-parity): bf16 SpMM message "
                        "stream + bf16 fusion stack + stable softmax — "
                        "the fastest single-chip mode, and the one that "
                        "fits 1M-node graphs in one chip's HBM "
                        "(scripts/probe_bigmem.py)")
    p.add_argument("--fusion_chunk_rows", type=int,
                   help="stream temporal fusion in node blocks of this "
                        "size (memory bound at huge node counts; 0 = off)")
    p.add_argument("--remat", action="store_true", default=None,
                   dest="remat_propagation",
                   help="rematerialize propagation in the backward pass")
    p.add_argument("--mesh_data", type=int, default=0,
                   help="mesh 'data' axis size (0 = no explicit mesh)")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="mesh 'model' axis size")
    p.add_argument("--profile_dir",
                   help="write a jax.profiler trace of epoch 0 here")
    p.add_argument("--synth_users", type=int, default=2048,
                   help="--data synthetic: number of users")
    p.add_argument("--synth_items", type=int, default=4096,
                   help="--data synthetic: number of items")
    p.add_argument("--synth_edges", type=int, default=0,
                   help="--data synthetic: total edge budget; >0 switches "
                        "to the vectorized large-scale generator "
                        "(1M+ users / 100M+ edges)")
    p.add_argument("--synth_test_users", type=int, default=4096,
                   help="large-scale generator only: number of held-out "
                        "test users (wider = less noisy full-sort metrics "
                        "at 1M scale; eval cost scales linearly)")
    p.add_argument("--time_budget_h", type=float,
                   help="stop cleanly at an epoch boundary when the next "
                        "epoch (predicted from the measured mean) would "
                        "exceed this wall-clock budget; checkpoints "
                        "finalize and the max line prints (resume with "
                        "--load_model is trajectory-exact)")
    p.add_argument("--supervise", action="store_true",
                   help="run under the wedge watchdog "
                        "(train/supervisor.py): auto-detect a hung run "
                        "(no log output + ~zero CPU), SIGTERM it so the "
                        "preemption handler commits staged saves, clean "
                        "partial checkpoints, probe the device, and "
                        "relaunch with --load_model")
    p.add_argument("--supervise_wedge_secs", type=float, default=300.0,
                   help="how long the (no-log AND no-CPU) conjunction "
                        "must hold before a wedge is declared")
    p.add_argument("--supervise_max_recoveries", type=int, default=8)
    return p.parse_args()


MODEL_KEYS = {f.name for f in dataclasses.fields(ModelConfig)}
TRAIN_KEYS = {f.name for f in dataclasses.fields(TrainConfig)}


def build_config(ns: argparse.Namespace) -> Config:
    cfg = PRESETS.get(ns.data, Config())
    m_over = {k: v for k, v in vars(ns).items()
              if k in MODEL_KEYS and v is not None}
    if ns.bf16:
        m_over.setdefault("spmm_exact", False)
        m_over.setdefault("fusion_dtype", "bf16")
        m_over.setdefault("stable_softmax", True)
    t_over = {k: v for k, v in vars(ns).items()
              if k in TRAIN_KEYS and v is not None}
    return Config(
        model=dataclasses.replace(cfg.model, **m_over),
        train=dataclasses.replace(cfg.train, **t_over),
        data=DataConfig(data=ns.data, data_dir=ns.data_dir,
                        noise_percent=ns.percent),
    )


def main() -> None:
    import sys
    ns = parse_args()
    if ns.supervise:
        # the supervisor must not touch the device itself: re-exec this
        # command line (minus the supervisor flags) as a watched child
        from sagnn_tpu.train.supervisor import supervise_main
        ns.save_path = build_config(ns).train.save_path  # preset-aware
        raise SystemExit(supervise_main(ns, sys.argv))
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    cfg = build_config(ns)
    log("Start")
    if ns.data == "synthetic":
        if ns.synth_edges > 0:
            from sagnn_tpu.data.synthetic import synthetic_large_dataset
            bundle = synthetic_large_dataset(
                num_users=ns.synth_users, num_items=ns.synth_items,
                total_edges=ns.synth_edges,
                graph_num=cfg.model.graph_num,
                test_size=cfg.train.test_size,
                num_test_users=ns.synth_test_users, seed=cfg.train.seed)
        else:
            bundle = synthetic_dataset(num_users=ns.synth_users,
                                   num_items=ns.synth_items,
                                   graph_num=cfg.model.graph_num,
                                   test_size=cfg.train.test_size,
                                   seed=cfg.train.seed)
    else:
        bundle = load_dataset(cfg.data.predir, cfg.data.noise_percent)
    log(f"Load Data: USER {bundle.num_users} ITEM {bundle.num_items}")
    if bundle.graph_num != cfg.model.graph_num:
        cfg = Config(model=dataclasses.replace(
            cfg.model, graph_num=bundle.graph_num),
            train=cfg.train, data=cfg.data)
    mesh = None
    if ns.mesh_data or ns.mesh_model > 1:
        from sagnn_tpu.parallel.mesh import make_mesh
        data_ax = ns.mesh_data or max(
            1, jax.device_count() // ns.mesh_model)
        mesh = make_mesh(data=data_ax, model=ns.mesh_model)
        log(f"Mesh: data={data_ax} model={ns.mesh_model}")
    trainer = Trainer(cfg, bundle, ckpt_root=ns.ckpt_root, mesh=mesh)
    trainer.debug_uid = ns.uid
    log("Model Prepared")
    if ns.import_tf1:
        from sagnn_tpu.train.import_tf1 import import_tf1_checkpoint
        imported = import_tf1_checkpoint(ns.import_tf1, cfg.model,
                                         with_optimizer=True)
        trainer.load_imported_params(**imported)
        log(f"Imported TF1 checkpoint {ns.import_tf1} "
            f"(global step {imported['step']})")
    if ns.profile_dir:
        # profile a throwaway epoch WITHOUT perturbing the real run: snapshot
        # optimizer/param state and the RNG, restore both afterwards
        from sagnn_tpu.utils.profiling import trace
        # deep device copies: the jitted step donates its state buffers, so
        # aliased references would be invalidated by the profiled epoch
        import jax.numpy as jnp
        state_snapshot = jax.tree_util.tree_map(jnp.copy, trainer.state)
        rng_snapshot = trainer.rng
        with trace(ns.profile_dir):
            trainer.train_epoch(verbose=False)
        trainer.state = state_snapshot
        trainer.rng = rng_snapshot
        log(f"Profile trace written to {ns.profile_dir}")
    trainer.run(resume=cfg.train.load_model is not None)


if __name__ == "__main__":
    main()
