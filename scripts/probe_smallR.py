"""Probe: SHORTER target blocks (R=8..64) — cutting the one-hot MXU cost.

Round-4 finding (bench.py vs_gather_bound): the SpMM is NOT purely
gather-bound — the measured gather+materialize bound at the bench shape is
223.5 ms f32 / 84.2 ms bf16 per step vs 351 / 171.5 ms achieved, i.e. the
kernel adds ~130/87 ms ON TOP of the memory traffic. The one-hot matmul
explains it: out_block[R, D] += one_hot[C, R]^T @ msgs[C, D] costs
2·R·D FLOP PER EDGE — independent of chunk size — which at R=128, D=64 is
16.4 kFLOP/edge = 786 GFLOP/step at the bench shape (~40+ ms at the
chip's effective MXU rate, 3x that under exact-f32 3-pass dots).

probe_blockR tried TALLER blocks (R=256/512, chasing slot fill) — the
wrong direction for MXU cost. This probe goes DOWN: R=8/16/32/64 divides
the one-hot FLOPs by 16/8/4/2 while dense-fill chunk occupancy stays
~0.75+ (a 4M-edge interval has ~650-780 edges per 8-row target block).
Low-fill graphs will pay more padding at small R; both fills measured.

Run ON THE CHIP: python scripts/probe_smallR.py [--fill gowalla]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CHAIN = 4
ITERS = 3
LATDIM = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fill", default="bench", choices=["bench", "gowalla"])
    ap.add_argument("--exact", action="store_true")
    ns = ap.parse_args()
    if ns.fill == "bench":
        graph_num, gnn_layer, edges = 3, 2, 4_000_000
    else:
        graph_num, gnn_layer, edges = 3, 2, 1_000_000
    num_users, num_items = 49_152, 40_960

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    from sagnn_tpu.ops import spmm_pallas as sp

    rng = np.random.default_rng(0)
    u_src = np.empty((graph_num, edges), np.int32)
    u_tgt = np.empty_like(u_src)
    i_src = np.empty_like(u_src)
    i_tgt = np.empty_like(u_src)
    for k in range(graph_num):
        rows = rng.integers(0, num_users, edges, dtype=np.int32)
        cols = rng.integers(0, num_items, edges, dtype=np.int32)
        o = np.argsort(rows, kind="stable")
        u_tgt[k], u_src[k] = rows[o], cols[o]
        o = np.argsort(cols, kind="stable")
        i_tgt[k], i_src[k] = cols[o], rows[o]

    key = jax.random.PRNGKey(0)
    u_emb = jax.random.normal(key, (graph_num, num_users, LATDIM),
                              jnp.float32)
    i_emb = jax.random.normal(key, (graph_num, num_items, LATDIM),
                              jnp.float32)
    edges_per_step = 2 * gnn_layer * graph_num * edges

    def run_config(Rval, cs, exact):
        saved = sp.R
        sp.R = Rval
        try:
            plans_np = sp.build_stacked_plans(
                u_src, u_tgt, i_src, i_tgt, num_users, num_items,
                np.full(graph_num, edges), chunk_size=cs)
            plans = {d: {k: jnp.asarray(v) for k, v in plans_np[d].items()}
                     for d in ("u", "i")}
            nb_u = plans_np["num_blocks_u"]
            nb_i = plans_np["num_blocks_i"]
            slots = (plans_np["u"]["tgt_local"].size
                     + plans_np["i"]["tgt_local"].size) * gnn_layer
            fill = edges_per_step / 2 / slots

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
                    for _l in range(gnn_layer):
                        a0 = hop(embs1[-1], fu, fi, nb_u, num_users,
                                 nb_i, num_items)
                        a1 = hop(embs0[-1], fi, fu, nb_i, num_items,
                                 nb_u, num_users)
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
            sp.R = saved

    ref_dt, ref_v = run_config(128, 0, ns.exact)
    for Rval in (64, 32, 16, 8):
        for cs in (0, 512):
            dt, v = run_config(Rval, cs, ns.exact)
            # numerics must agree with the R=128 reference (same sums,
            # different block decomposition; f32 tree order differs)
            if abs(v - ref_v) > 1e-3 * max(abs(ref_v), 1.0):
                log(f"  CHECKSUM MISMATCH vs R=128: {v} != {ref_v}")
            log(f"  -> speedup vs R=128: {ref_dt/dt:.3f}x")


if __name__ == "__main__":
    main()
