"""Regression-guard the 1M-node-scale train step (VERDICT r4 #4).

The flagship single-chip numbers — 7.50 s/step bf16 full-coverage
(batch 4096) and 8.84 s/step exact-f32 (batch 512) at 1,048,576 users x
786,432 items x 60M edges — previously lived only in STATUS prose; a
dead-arg-pruning or fold regression at that scale would ship silently.
This script measures the recipes end-to-end (same generator seed, same
Trainer path as main.py) in a time-boxed run and appends to
BENCH_1M.json with a >5% regression flag; bench.py surfaces the last
recorded values into the driver's JSON line as `step_1m_*_ms_recorded`.

    python scripts/bench_1m.py [--steps 3] [--recipes bf16_b4096,exact_b512]

~10 min cold (dataset ~2 min, plans ~3 min, compile ~4 min, steps);
~6 min with a warm /tmp/jax_cache.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


USERS, ITEMS, EDGES, G = 1_048_576, 786_432, 60_000_000, 3

# recipe name -> (batch, ModelConfig overrides) — the measured DESIGN §8
# one-chip recipes at 1M-node scale
RECIPES = {
    # full-coverage bf16 epoch recipe (256 steps/epoch, STATUS r4 #8)
    "bf16_b4096": (4096, dict(remat_propagation=True,
                              fusion_chunk_rows=32_768,
                              fusion_dtype="bf16", stable_softmax=True,
                              spmm_exact=False)),
    # parity-precision recipe (STATUS r3 #13)
    "exact_b512": (512, dict(remat_propagation=True,
                             fusion_chunk_rows=16_384,
                             spmm_fold_gather=True)),
    # exact FULL-COVERAGE recipe (round 5: chunk8k makes batch 1024 fit —
    # 1024 steps/epoch; probe_bigmem exactfold+chunk8k+batch1024 FIT)
    "exact_b1024": (1024, dict(remat_propagation=True,
                               fusion_chunk_rows=8_192,
                               spmm_fold_gather=True)),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3,
                    help="timed steps per recipe (after the compile step)")
    ap.add_argument("--recipes", default="bf16_b4096",
                    help="comma-separated subset of " + ",".join(RECIPES))
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from sagnn_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from sagnn_tpu.data.synthetic import synthetic_large_dataset
    from sagnn_tpu.train.trainer import Trainer

    t0 = time.perf_counter()
    bundle = synthetic_large_dataset(
        num_users=USERS, num_items=ITEMS, total_edges=EDGES, graph_num=G,
        test_size=100, seed=0)
    log(f"dataset: {time.perf_counter() - t0:.0f}s")

    out = {"metric": "step_1m_ms", "unit": "ms/step"}
    for name in args.recipes.split(","):
        batch, model_kw = RECIPES[name]
        cfg = Config(
            model=ModelConfig(graph_num=G, gnn_layer=2, att_layer=1,
                              latdim=64, num_heads=8, ssldim=48,
                              pos_length=200, spmm_backend="pallas",
                              **model_kw),
            # trn_num = full coverage: decay_step (= trn_num // batch) then
            # matches the flagship recipe exactly, so the compiled step is
            # byte-identical to main.py's and shares its compile cache
            train=TrainConfig(batch=batch, samp_num=10, ssl_num=8,
                              trn_num=USERS, test_size=100),
            data=DataConfig(data="synthetic"),
        )
        t0 = time.perf_counter()
        tr = Trainer(cfg, bundle, ckpt_root="/tmp/bench_1m_models")
        log(f"[{name}] trainer+plans: {time.perf_counter() - t0:.0f}s")
        ids = tr.sampler.epoch_user_ids(cfg.train.trn_num)
        key = jax.random.PRNGKey(1)
        times = []
        for i in range(args.steps + 1):
            bat = ids[i * batch:(i + 1) * batch]
            batch_data = tr.sampler.train_batch(bat)
            t0 = time.perf_counter()
            tr.state, stats = tr._train_step(tr.state, tr.graphs,
                                             batch_data, key)
            loss = float(stats["loss"])  # fetch = the honest device sync
            dt = time.perf_counter() - t0
            if i == 0:
                log(f"[{name}] compile+step0: {dt:.1f}s loss={loss:.3f}")
            else:
                times.append(dt)
                log(f"[{name}] step {i}: {dt:.2f}s loss={loss:.3f}")
        out[f"step_1m_{name}_ms"] = round(float(np.mean(times)) * 1e3, 1)
        del tr

    hist_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_1M.json")
    history = []
    if os.path.exists(hist_path):
        with open(hist_path) as f:
            history = json.load(f)
    if history:
        prev = history[-1]
        for k, v in list(out.items()):
            if k.endswith("_ms") and k in prev and v > prev[k] * 1.05:
                log(f"REGRESSION: {k} {v} ms vs previous {prev[k]} ms "
                    f"— >5% slower")
                out.setdefault("regressions", []).append(k)
    history.append({"time": time.strftime("%Y-%m-%d %H:%M:%S"),
                    **{k: v for k, v in out.items()
                       if k.endswith("_ms")}})
    with open(hist_path, "w") as f:
        json.dump(history, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
