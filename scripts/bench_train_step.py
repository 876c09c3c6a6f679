"""Device-side train-step decomposition at gowalla scale.

Times, with relay-amortized chained dispatch (CHAIN data-dependent
iterations inside one jit — see bench.py), three nested slices of the
training step on the real chip:

  fwd       model.train_losses (propagation + fusion + seq + SSL + reg)
  fwd+bwd   value_and_grad of the total loss
  full      make_train_step (fwd + bwd + TF1-Adam update)

and reports the derived bwd / optimizer costs. This is the honest
device-side step time a production loop pays (host sampling overlaps via
the trainer's prefetch pool and is measured separately by
scripts/e2e_synthetic.py).

Usage: python scripts/bench_train_step.py [--backend pallas|xla]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN = 4
ITERS = 8


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="pallas",
                    choices=["pallas", "xla"])
    ap.add_argument("--num_users", type=int, default=49_152)
    ap.add_argument("--num_items", type=int, default=40_960)
    ap.add_argument("--parts", action="store_true",
                    help="time each forward component separately")
    ap.add_argument("--chunk_size", type=int, default=0,
                    help="rebuild the pallas plans with this chunk size")
    ap.add_argument("--only", default=None,
                    help="with --parts: time only this component")
    ap.add_argument("--fold", action="store_true",
                    help="row-folded exact gathers (spmm_fold_gather)")
    ap.add_argument("--bf16", action="store_true",
                    help="throughput mode: spmm_exact=False (bf16 message "
                         "stream) + fusion_dtype=bf16 (non-parity)")
    ap.add_argument("--graph_num", type=int, default=3)
    ap.add_argument("--gnn_layer", type=int, default=2)
    ns = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from sagnn_tpu.config import Config, ModelConfig, TrainConfig
    from sagnn_tpu.data.synthetic import synthetic_dataset
    from sagnn_tpu.models.selfgnn import reg_loss
    from sagnn_tpu.train.trainer import Trainer, make_train_step

    cfg = Config(
        model=ModelConfig(graph_num=ns.graph_num, gnn_layer=ns.gnn_layer,
                          att_layer=1, latdim=64,
                          num_heads=4, ssldim=48, pos_length=200,
                          keep_rate=1.0, spmm_backend=ns.backend,
                          spmm_exact=not ns.bf16,
                          spmm_fold_gather=ns.fold,
                          fusion_dtype="bf16" if ns.bf16 else "f32",
                          stable_softmax=ns.bf16),
        train=TrainConfig(batch=512, samp_num=40, ssl_num=40, trn_num=10_000,
                          test_size=1000, lr=2e-3, reg=1e-2, ssl_reg=1e-6),
    )
    print(f"backend={ns.backend} users={ns.num_users} items={ns.num_items}",
          file=sys.stderr)
    bundle = synthetic_dataset(num_users=ns.num_users,
                               num_items=ns.num_items,
                               graph_num=ns.graph_num, test_size=20, seed=7,
                               seq_len_range=(10, 50))
    edges = [m.nnz for m in bundle.sub_mats]
    print(f"interval edges: {edges}", file=sys.stderr)
    tr = Trainer(cfg, bundle, ckpt_root="/tmp/bench_step_models")
    if ns.chunk_size and ns.backend == "pallas":
        from sagnn_tpu.ops.spmm_pallas import build_stacked_plans
        gb = tr.graph_blocks
        plans = build_stacked_plans(gb.u_src, gb.u_tgt, gb.i_src, gb.i_tgt,
                                    gb.num_users, gb.num_items,
                                    gb.edge_counts,
                                    chunk_size=ns.chunk_size)
        tr.graphs["plans"] = {
            "u": {k: jnp.asarray(v) for k, v in plans["u"].items()},
            "i": {k: jnp.asarray(v) for k, v in plans["i"].items()},
        }
        print(f"chunk_size={ns.chunk_size}: "
              f"u chunks {plans['u']['tgt_local'].shape} "
              f"i chunks {plans['i']['tgt_local'].shape}", file=sys.stderr)
    batch = tr.sampler.train_batch(np.arange(cfg.train.batch))
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    rng = jax.random.PRNGKey(3)
    model, graphs, params = tr.model, tr.graphs, tr.state["params"]
    reg_w, ssl_w = cfg.train.reg, cfg.train.ssl_reg

    def perturb(p, c):
        # data-dependence: next iteration's params depend on this one's
        # result so XLA cannot hoist the loop body (bench.py _chain_steps)
        return jax.tree_util.tree_map(lambda a: a + c, p)

    # graphs/batch ride as jit ARGUMENTS everywhere below: closure
    # constants enter the remote-compile payload (HTTP 413 past ~100 MB)

    @jax.jit
    def fwd_chain(p, graphs, batch):
        def body(c, _):
            pre, ssl, _ = model.train_losses(perturb(p, c * 1e-12), graphs,
                                             batch, rng)
            loss = pre + reg_w * reg_loss(p) + ssl_w * ssl
            return loss * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
        return c

    @jax.jit
    def grad_chain(p, graphs, batch):
        def lf(q):
            pre, ssl, _ = model.train_losses(q, graphs, batch, rng)
            return pre + reg_w * reg_loss(q) + ssl_w * ssl

        def body(c, _):
            loss, g = jax.value_and_grad(lf)(perturb(p, c * 1e-12))
            gsum = sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(g))
            return (loss + gsum) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
        return c

    raw_step = make_train_step(model, tr.optimizer, reg_w, ssl_w)

    @jax.jit
    def step_chain(state, graphs, batch):
        def body(st, _):
            st, stats = raw_step(st, graphs, batch, rng)
            return st, stats["loss"]
        st, losses = jax.lax.scan(body, state, None, length=CHAIN)
        return losses[-1]

    from sagnn_tpu.utils.profiling import time_scalar_fetch

    def timeit(name, fn, *args):
        ms, v = time_scalar_fetch(fn, *args, iters=ITERS, chain=CHAIN)
        print(f"{name:8s} {ms:8.2f} ms/step   (check {v:.3e})",
              file=sys.stderr)
        return ms

    if ns.parts:
        from sagnn_tpu.models.selfgnn import (_interval_propagation,
                                              _sequence_branch,
                                              _ssl_loss, _temporal_fusion,
                                              _user_weights)
        mcfg = cfg.model

        def chain_of(fn):
            """Chain CHAIN data-dependent evals of fn(c, ops) (c a f32
            scalar folded into fn's input) under one jit; `ops` (the big
            operand pytree) rides as a jit argument, not a closure."""
            @jax.jit
            def run(ops):
                def body(c, _):
                    return fn(c * 1e-12, ops) * 1e-20, None
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                    length=CHAIN)
                return c
            return run

        uv, iv = _interval_propagation(params, graphs, mcfg, ns.num_users,
                                       ns.num_items)
        fu, fi = _temporal_fusion(params, uv, iv, mcfg, True, rng)
        uw = _user_weights(params, fu, uv, mcfg)

        def tsum(t):
            return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(t))

        def padd(p, c):
            return jax.tree_util.tree_map(lambda a: a + c, p)

        parts = {
            "prop": (lambda c, o: tsum(_interval_propagation(
                padd(o["p"], c), o["g"], mcfg, ns.num_users, ns.num_items)),
                {"p": params, "g": graphs}),
            "fusion": (lambda c, o: tsum(_temporal_fusion(
                o["p"], o["uv"] + c, o["iv"] + c, mcfg, True, rng)),
                {"p": params, "uv": uv, "iv": iv}),
            "seq": (lambda c, o: tsum(_sequence_branch(
                o["p"], o["fi"] + c, o["b"].seq, o["b"].seq_mask, mcfg)),
                {"p": params, "fi": fi, "b": batch}),
            "meta": (lambda c, o: tsum(_user_weights(
                o["p"], o["fu"] + c, o["uv"], mcfg)),
                {"p": params, "fu": fu, "uv": uv}),
            "ssl": (lambda c, o: _ssl_loss(
                o["p"], o["b"], o["fu"] + c, o["fi"], o["uv"], o["iv"],
                o["uw"], mcfg),
                {"p": params, "b": batch, "fu": fu, "fi": fi, "uv": uv,
                 "iv": iv, "uw": uw}),
            "reg": (lambda c, o: reg_loss(padd(o["p"], c)), {"p": params}),
        }
        for name, (fn, ops) in parts.items():
            if ns.only and name != ns.only:
                continue
            timeit(name, chain_of(fn), ops)
        return

    fwd = timeit("fwd", fwd_chain, params, graphs, batch)
    fb = timeit("fwd+bwd", grad_chain, params, graphs, batch)
    full = timeit("full", step_chain, tr.state, graphs, batch)
    print(f"derived: bwd {fb - fwd:.2f} ms, optimizer {full - fb:.2f} ms",
          file=sys.stderr)
    import json
    print(json.dumps({"fwd_ms": round(fwd, 2), "fwd_bwd_ms": round(fb, 2),
                      "full_ms": round(full, 2),
                      "backend": ns.backend, "edges": edges}))


if __name__ == "__main__":
    main()
