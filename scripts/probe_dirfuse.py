"""Probe: fuse the two propagation directions of one interval-layer into a
single gather + single Pallas call.

At the yelp shape (12 intervals x 3 layers) propagation is per-hop-overhead
bound (~58% of the gather roofline; see probe_blockR.py). Each layer runs
two independent SpMMs reading the PREVIOUS layer's embeddings:

    a_u = A_k   @ i_emb      (item->user)
    a_i = A_k^T @ u_emb      (user->item)

which is one block-diagonal SpMM over the concatenated table
X = [u_emb; i_emb]:  [a_u; a_i] = blockdiag(A_k, A_k^T) @ X — expressible
with the EXISTING kernel by relabeling target rows (item targets offset by
nb_u*R) and source ids (item sources offset by U_pad). Halves the gather
ops and kernel calls per hop-pair at the cost of one [U+I, D] concat per
layer.

Run ON THE CHIP: python scripts/probe_dirfuse.py
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

    R = sp.R
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

    nb_u = -(-NUM_USERS // R)
    nb_i = -(-NUM_ITEMS // R)
    U_PAD = nb_u * R

    def timeit(tag, chained, *args):
        v = float(chained(*args))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            v = float(chained(*args))
        dt = (time.perf_counter() - t0) / ITERS / CHAIN
        log(f"{tag:28s}: {dt*1e3:7.2f} ms  "
            f"{edges_per_step/dt/1e6:7.1f} Me/s  chk={v:.6e}")
        return dt

    # ---- baseline: separate directions (current model path) --------------
    def make_baseline(cs):
        plans_np = sp.build_stacked_plans(
            u_src, u_tgt, i_src, i_tgt, NUM_USERS, NUM_ITEMS,
            np.full(GRAPH_NUM, EDGES), chunk_size=cs)
        plans = {d: {k: jnp.asarray(v) for k, v in plans_np[d].items()}
                 for d in ("u", "i")}

        def propagation(u_emb, i_emb, plans):
            def hop(x, fwd, bwd, fnb, fnt, bnb, bnt):
                agg = sp.spmm(x, fwd, bwd, fnb, fnt, bnb, bnt, False)
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
            c, _ = jax.lax.scan(outer, jnp.float32(0.0), None, length=CHAIN)
            return c

        return chained, plans

    # ---- direction-fused: blockdiag(A, A^T) over X=[u;i] ------------------
    def make_fused(cs):
        plans = []
        for k in range(GRAPH_NUM):
            # user-direction edges: gather item row (U_PAD + src in X),
            # write user target rows [0, U)
            fs = U_PAD + u_src[k]
            ft = u_tgt[k]
            # item-direction edges: gather user row, write item targets
            # offset by U_PAD (a block multiple, so tgt_local is unchanged)
            gs = i_src[k]
            gt = U_PAD + i_tgt[k]
            src = np.concatenate([fs, gs])
            tgt = np.concatenate([ft, gt])
            o = np.argsort(tgt, kind="stable")
            p = sp.plan_spmm(src[o], tgt[o], U_PAD + NUM_ITEMS,
                             num_edges=2 * EDGES,
                             chunk_size=cs or sp.C)
            plans.append(p)
        nc = -(-max(p.num_chunks for p in plans) // 8) * 8
        plans = [p if p.num_chunks == nc else sp.plan_spmm_repad(p, nc)
                 for p in plans]
        stacked = {
            "src": jnp.asarray(np.stack([p.src for p in plans])),
            "tgt_local": jnp.asarray(np.stack([p.tgt_local for p in plans])),
            "chunk_block": jnp.asarray(
                np.stack([p.chunk_block for p in plans])),
            "chunk_first": jnp.asarray(
                np.stack([p.chunk_first for p in plans])),
        }
        num_blocks = plans[0].num_blocks
        num_tgt = U_PAD + NUM_ITEMS

        def propagation(u_emb, i_emb, pl):
            def one(_, inp):
                u0, i0, p = inp
                x = jnp.concatenate(
                    [jnp.pad(u0, ((0, U_PAD - NUM_USERS), (0, 0))), i0])
                us, iv = u0, i0
                outs_u, outs_i = u0, i0
                for _l in range(GNN_LAYER):
                    agg = sp.spmm_apply(
                        x, p["src"], p["tgt_local"], p["chunk_block"],
                        p["chunk_first"], num_blocks, num_tgt, exact=False)
                    agg = jnp.maximum(0.5 * agg, agg)
                    us = agg[:NUM_USERS] + x[:NUM_USERS]
                    iv = agg[U_PAD:] + x[U_PAD:]
                    outs_u = outs_u + us
                    outs_i = outs_i + iv
                    x = jnp.concatenate(
                        [jnp.pad(us, ((0, U_PAD - NUM_USERS), (0, 0))), iv])
                return None, (outs_u.sum(), outs_i.sum())

            _, (uv, iv) = jax.lax.scan(one, None, (u_emb, i_emb, pl))
            return uv.sum() + iv.sum()

        @jax.jit
        def chained(u_emb, i_emb, pl):
            def outer(c, _):
                s = propagation(u_emb + c * 1e-12, i_emb, pl)
                return s * 1e-20, None
            c, _ = jax.lax.scan(outer, jnp.float32(0.0), None, length=CHAIN)
            return c

        return chained, stacked

    base, bplans = make_baseline(0)
    timeit("separate (auto CS)", base, u_emb, i_emb, bplans)
    for cs in (256, 512, 1024):
        fused, fplans = make_fused(cs)
        timeit(f"dir-fused CS={cs}", fused, u_emb, i_emb, fplans)


if __name__ == "__main__":
    main()
