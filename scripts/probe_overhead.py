"""Probe: where do the non-gather milliseconds go? (round 4)

bench.py's vs_gather_bound measures the gather+materialize memory bound at
223.5 ms f32 / 84.2 ms bf16 per bench step vs 351 / 171.5 achieved.
probe_smallR showed the one-hot FLOPs are NOT the gap (R=8, 16x fewer
flops, is SLOWER). Remaining suspects, isolated here at the bench shape:

  1. chunk-grid overhead: sweep CS=1024/2048/4096 at R=128 (fill stays
     ~0.94 at dense fill; chunks halve/quarter).
  2. the MXU dot itself: an ablated kernel that streams the same message
     blocks but replaces the one-hot dot with a VPU column-sum (reads all
     of msgs, writes out block) — pipeline+stream cost without matmul.
  3. the XLA-side gather+stream with NO pallas consumer (the bound).

Run ON THE CHIP: python scripts/probe_overhead.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CHAIN = 4
ITERS = 3
GRAPH_NUM = 3
GNN_LAYER = 2
NUM_USERS = 49_152
NUM_ITEMS = 40_960
LATDIM = 64
EDGES = 4_000_000


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
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
    u_emb = jax.random.normal(key, (GRAPH_NUM, NUM_USERS, LATDIM),
                              jnp.float32)
    i_emb = jax.random.normal(key, (GRAPH_NUM, NUM_ITEMS, LATDIM),
                              jnp.float32)
    edges_per_step = 2 * GNN_LAYER * GRAPH_NUM * EDGES

    def timeit(label, fn, *args):
        v = float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            v = float(fn(*args))
        dt = (time.perf_counter() - t0) / ITERS / CHAIN
        log(f"{label:28s} {dt*1e3:8.2f} ms/step  "
            f"{edges_per_step/dt/1e6:7.1f} Me/s  chk={v:.3e}")
        return dt

    def chained(body):
        @jax.jit
        def run(u_emb, i_emb, plans):
            def outer(c, _):
                s = body(u_emb + c * 1e-12, i_emb, plans)
                return s * 1e-20, None
            c, _ = jax.lax.scan(outer, jnp.float32(0.0), None, length=CHAIN)
            return c
        return run

    # ablated segment-sum: same grid/BlockSpecs as _segsum_kernel but the
    # dot is replaced by a VPU column reduction (full msgs read, out write)
    def ablate_kernel(first_ref, blk_ref, tl_ref, msg_ref, out_ref):
        del blk_ref
        c = pl.program_id(0)

        @pl.when(first_ref[c] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        tl = tl_ref[0].astype(jnp.float32)                  # [1, C] consumed
        s = jnp.sum(msg_ref[:].astype(jnp.float32), axis=0,
                    keepdims=True)                          # [1, D]
        out_ref[:] += s + jnp.sum(tl) * 1e-30

    def ablated_segsum(messages, tgt_local, chunk_block, chunk_first,
                       num_blocks):
        nc, cs = tgt_local.shape[0], tgt_local.shape[-1]
        d = messages.shape[-1]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nc,),
            in_specs=[
                pl.BlockSpec((1, 1, cs), lambda c, f, b: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cs, d), lambda c, f, b: (c, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((sp.R, d), lambda c, f, b: (b[c], 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            ablate_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(((num_blocks + 1) * sp.R, d),
                                           jnp.float32),
        )(chunk_first, chunk_block, tgt_local.reshape(nc, 1, cs), messages)

    def make_prop(mode, exact=False):
        # mode: "full" (real spmm), "ablate" (no matmul), "bound" (no
        # pallas call at all — gather + barrier + sum)
        def prop(u_emb, i_emb, plans):
            def hop(x, p, nb, nt):
                if not exact:
                    x = x.astype(jnp.bfloat16)
                msgs = jnp.take(x, p["src"], axis=0)
                if mode == "bound":
                    m = jax.lax.optimization_barrier(msgs)
                    return jnp.zeros((nt, x.shape[-1]), jnp.float32) \
                        + m.sum() * 1e-30
                if mode == "ablate":
                    out = ablated_segsum(msgs, p["tgt_local"],
                                         p["chunk_block"],
                                         p["chunk_first"], nb)
                else:
                    out = sp._segsum_pallas(msgs, p["tgt_local"],
                                            p["chunk_block"],
                                            p["chunk_first"], nb,
                                            exact=exact)
                return out[:nt]

            def one(_, inp):
                u0, i0, pu, pi = inp
                embs0, embs1 = [u0], [i0]
                for _l in range(GNN_LAYER):
                    a0 = hop(embs1[-1], pu, nb_u, NUM_USERS)
                    a1 = hop(embs0[-1], pi, nb_i, NUM_ITEMS)
                    embs0.append(jnp.maximum(0.5 * a0, a0) + embs0[-1])
                    embs1.append(jnp.maximum(0.5 * a1, a1) + embs1[-1])
                return None, (sum(embs0[1:], embs0[0]).sum(),
                              sum(embs1[1:], embs1[0]).sum())

            _, (uv, iv) = jax.lax.scan(
                one, None, (u_emb, i_emb, plans["u"], plans["i"]))
            return uv.sum() + iv.sum()
        return prop

    for cs in (0, 2048, 4096):
        plans_np = sp.build_stacked_plans(
            u_src, u_tgt, i_src, i_tgt, NUM_USERS, NUM_ITEMS,
            np.full(GRAPH_NUM, EDGES), chunk_size=cs)
        plans = {d: {k: jnp.asarray(v) for k, v in plans_np[d].items()}
                 for d in ("u", "i")}
        nb_u = plans_np["num_blocks_u"]
        nb_i = plans_np["num_blocks_i"]
        slots = plans_np["u"]["tgt_local"].size \
            + plans_np["i"]["tgt_local"].size
        log(f"-- CS={cs or 'auto'}: "
            f"u {plans_np['u']['tgt_local'].shape} "
            f"i {plans_np['i']['tgt_local'].shape} "
            f"fill/dir={GRAPH_NUM * EDGES / slots:.3f}")
        timeit(f"CS={cs or 'auto'} full bf16", chained(make_prop("full")),
               u_emb, i_emb, plans)
        timeit(f"CS={cs or 'auto'} ablate bf16",
               chained(make_prop("ablate")), u_emb, i_emb, plans)
        if cs == 0:
            timeit("bound (no pallas) bf16", chained(make_prop("bound")),
                   u_emb, i_emb, plans)
            timeit("CS=auto full f32-exact",
                   chained(make_prop("full", exact=True)),
                   u_emb, i_emb, plans)


if __name__ == "__main__":
    main()
