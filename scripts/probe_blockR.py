"""Probe: target-block height R vs SpMM throughput at small-interval scale.

Hypothesis: the yelp shape (12 intervals x 3 layers, ~123k edges each over
49k users / 41k items) runs far off the gather roofline because every
128-row target block pads its tail chunk (and empty blocks emit a full pad
chunk) — with ~320 edges per block the executed-slot waste is ~2x. Taller
blocks (R=256/512) divide the per-block tail + empty-block waste by 2-4x.

Monkeypatches sagnn_tpu.ops.spmm_pallas.R (all uses read the global at
call/trace time) — measurement only; if it wins, R becomes a plan parameter.

Run ON THE CHIP: python scripts/probe_blockR.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GRAPH_NUM = 12
GNN_LAYER = 3
NUM_USERS = 49_152
NUM_ITEMS = 40_960
LATDIM = 64
EDGES = 123_000
CHAIN = 4
ITERS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    from sagnn_tpu.ops import spmm_pallas as sp

    rng = np.random.default_rng(0)
    u_src = np.empty((GRAPH_NUM, EDGES), np.int32)
    u_tgt = np.empty_like(u_src)
    i_src = np.empty_like(u_src)
    i_tgt = np.empty_like(u_src)
    for k in range(GRAPH_NUM):
        rows = rng.integers(0, NUM_USERS, EDGES, dtype=np.int32)
        cols = rng.integers(0, NUM_ITEMS, EDGES, dtype=np.int32)
        o = np.argsort(rows, kind="stable")
        u_tgt[k], u_src[k] = rows[o], cols[o]
        o = np.argsort(cols, kind="stable")
        i_tgt[k], i_src[k] = cols[o], rows[o]

    key = jax.random.PRNGKey(0)
    u_emb = jax.random.normal(key, (GRAPH_NUM, NUM_USERS, LATDIM), jnp.float32)
    i_emb = jax.random.normal(key, (GRAPH_NUM, NUM_ITEMS, LATDIM), jnp.float32)
    edges_per_step = 2 * GNN_LAYER * GRAPH_NUM * EDGES

    def run_config(Rval, cs, exact):
        sp_R_saved = sp.R
        sp.R = Rval
        try:
            plans_np = sp.build_stacked_plans(
                u_src, u_tgt, i_src, i_tgt, NUM_USERS, NUM_ITEMS,
                np.full(GRAPH_NUM, EDGES), chunk_size=cs)
            plans = {d: {k: jnp.asarray(v) for k, v in plans_np[d].items()}
                     for d in ("u", "i")}
            nb_u = plans_np["num_blocks_u"]
            nb_i = plans_np["num_blocks_i"]
            slots = (plans_np["u"]["tgt_local"].size
                     + plans_np["i"]["tgt_local"].size) * GNN_LAYER
            fill = edges_per_step / 2 / slots  # per direction-hop

            def propagation(u_emb, i_emb, plans):
                def hop(x, fwd, bwd, fnb, fnt, bnb, bnt):
                    agg = sp.spmm(x, fwd, bwd, fnb, fnt, bnb, bnt, exact)
                    return jnp.maximum(0.5 * agg, agg)

                def one(_, inp):
                    u0, i0, pu, pi = inp
                    fu = (pu["src"], pu["tgt_local"], pu["chunk_block"],
                          pu["chunk_first"])
                    fi = (pi["src"], pi["tgt_local"], pi["chunk_block"],
                          pi["chunk_first"])
                    embs0, embs1 = [u0], [i0]
                    for _l in range(GNN_LAYER):
                        a0 = hop(embs1[-1], fu, fi, nb_u, NUM_USERS,
                                 nb_i, NUM_ITEMS)
                        a1 = hop(embs0[-1], fi, fu, nb_i, NUM_ITEMS,
                                 nb_u, NUM_USERS)
                        embs0.append(a0 + embs0[-1])
                        embs1.append(a1 + embs1[-1])
                    return None, (sum(embs0[1:], embs0[0]).sum(),
                                  sum(embs1[1:], embs1[0]).sum())

                _, (uv, iv) = jax.lax.scan(
                    one, None, (u_emb, i_emb, plans["u"], plans["i"]))
                return uv.sum() + iv.sum()

            @jax.jit
            def chained(u_emb, i_emb, plans):
                def outer(c, _):
                    s = propagation(u_emb + c * 1e-12, i_emb, plans)
                    return s * 1e-20, None
                c, _ = jax.lax.scan(outer, jnp.float32(0.0), None,
                                    length=CHAIN)
                return c

            v = float(chained(u_emb, i_emb, plans))  # compile+warm
            t0 = time.perf_counter()
            for _ in range(ITERS):
                v = float(chained(u_emb, i_emb, plans))
            dt = (time.perf_counter() - t0) / ITERS / CHAIN
            log(f"R={Rval:4d} CS={cs or 'auto':>5} exact={exact} : "
                f"{dt*1e3:7.2f} ms/fwd-prop  "
                f"{edges_per_step/dt/1e6:7.1f} Me/s  fill={fill:.2f}  "
                f"chk={v:.3e}")
            return dt, v
        finally:
            sp.R = sp_R_saved

    for Rval, css in ((128, (0, 128)), (256, (0,)), (512, (0, 256))):
        for cs in css:
            run_config(Rval, cs, False)


if __name__ == "__main__":
    main()
