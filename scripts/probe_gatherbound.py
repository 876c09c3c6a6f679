"""Reconcile the two gather-roofline instruments (VERDICT r4 weak #1).

Round 4 shipped `vs_gather_bound` in bench.py reporting bf16 propagation
at 0.496 of a measured "gather-only bound" of ~85 ms — i.e. ~563 Mrows/s,
while DESIGN.md §3's calibration says plan-sorted row-gathers run at
~316 Mrows/s. Both cannot be the roofline. Two specific instrument bugs
could explain the disagreement, and this probe measures each:

A. CSE: bench.py's gather-only loop issues IDENTICAL gathers for both
   GNN layers (the real hop gathers from per-layer UPDATED embeddings);
   if XLA CSEs the duplicate pure gathers, the instrument counts half
   the rows the kernel path actually fetches -> a 2x-optimistic bound.
   Variant "dep" breaks CSE with a data-dependent perturbation (layer 2
   gathers from table + eps*acc(layer 1)) and is the honest instrument.

B. Scan-slice operand fusion: the tables ride the scan stacked [g, N, D]
   (f32: 37.7 MB users — past the ~32 MB gather cliff; bf16: 18.9 MB —
   under it). If XLA fuses dynamic-slice+gather into one gather from the
   STACKED operand, the f32 instrument pays the post-cliff rate while
   bf16 stays fast. Variant "presliced" gathers from per-interval [N, D]
   arrays passed as separate operands (no scan) to isolate this.

Also measures the pure plan-sorted row-gather rate at the bench's exact
tables/plans (the DESIGN §3 calibration, re-run at this shape) and
prints the resulting structural floor per precision:

    floor = rows / measured_rows_per_s            (latency-bound fetch)
          + 2 * E * D * bytes / stream_BW         ([E,D] write + readback)

which is what bench.py's calibrated `vs_floor` should divide by.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


GRAPH_NUM = 3
GNN_LAYER = 2
NUM_USERS = 49_152
NUM_ITEMS = 40_960
LATDIM = 64
EDGES = 4_000_000
CHAIN = 4


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    from bench import build_blocks, _chain_steps, _time_fn
    from sagnn_tpu.ops.spmm_pallas import build_stacked_plans

    rng = np.random.default_rng(0)
    blocks_np = build_blocks(rng)
    plans_np = build_stacked_plans(
        *blocks_np, NUM_USERS, NUM_ITEMS, np.full(GRAPH_NUM, EDGES))
    plans = {d: {k: jnp.asarray(v) for k, v in plans_np[d].items()}
             for d in ("u", "i")}
    key = jax.random.PRNGKey(0)
    u_emb = jax.random.normal(key, (GRAPH_NUM, NUM_USERS, LATDIM),
                              jnp.float32)
    i_emb = jax.random.normal(key, (GRAPH_NUM, NUM_ITEMS, LATDIM),
                              jnp.float32)
    rows_per_step = 2 * GNN_LAYER * GRAPH_NUM * EDGES  # 48M

    # -- variant zoo --------------------------------------------------------
    def make_gather(exact, break_cse, presliced):
        def gather_scan(u_emb, i_emb, plans):
            def one(carry, inp):
                u0, i0, pu, pi = inp
                if not exact:
                    u0 = u0.astype(jnp.bfloat16)
                    i0 = i0.astype(jnp.bfloat16)
                acc = carry
                for _l in range(GNN_LAYER):
                    iop = i0 + acc.astype(i0.dtype) * 1e-30 if break_cse \
                        else i0
                    uop = u0 + acc.astype(u0.dtype) * 1e-30 if break_cse \
                        else u0
                    m = jax.lax.optimization_barrier(
                        jnp.take(iop, pu["src"], axis=0))
                    acc = acc + m.sum().astype(jnp.float32)
                    m = jax.lax.optimization_barrier(
                        jnp.take(uop, pi["src"], axis=0))
                    acc = acc + m.sum().astype(jnp.float32)
                return acc, None

            acc, _ = jax.lax.scan(one, jnp.float32(0.0),
                                  (u_emb, i_emb, plans["u"], plans["i"]))
            return acc

        def gather_presliced(u_emb, i_emb, plans):
            # per-interval tables as SEPARATE [N, D] operands: no stacked
            # scan operand for the gather to fuse into
            acc = jnp.float32(0.0)
            for g in range(GRAPH_NUM):
                u0, i0 = u_emb[g], i_emb[g]
                if not exact:
                    u0 = u0.astype(jnp.bfloat16)
                    i0 = i0.astype(jnp.bfloat16)
                u0 = jax.lax.optimization_barrier(u0)
                i0 = jax.lax.optimization_barrier(i0)
                pu = {k: v[g] for k, v in plans["u"].items()}
                pi = {k: v[g] for k, v in plans["i"].items()}
                for _l in range(GNN_LAYER):
                    iop = i0 + acc.astype(i0.dtype) * 1e-30 if break_cse \
                        else i0
                    uop = u0 + acc.astype(u0.dtype) * 1e-30 if break_cse \
                        else u0
                    m = jax.lax.optimization_barrier(
                        jnp.take(iop, pu["src"], axis=0))
                    acc = acc + m.sum().astype(jnp.float32)
                    m = jax.lax.optimization_barrier(
                        jnp.take(uop, pi["src"], axis=0))
                    acc = acc + m.sum().astype(jnp.float32)
            return acc

        return gather_presliced if presliced else gather_scan

    results = {}
    for label, exact, break_cse, presliced in (
            ("r4-instrument f32", True, False, False),
            ("r4-instrument bf16", False, False, False),
            ("cse-broken f32", True, True, False),
            ("cse-broken bf16", False, True, False),
            ("cse-broken presliced f32", True, True, True),
            ("cse-broken presliced bf16", False, True, True)):
        fn = make_gather(exact, break_cse, presliced)
        dt, _ = _time_fn(_chain_steps(fn), u_emb, i_emb, plans, iters=3)
        dt /= CHAIN
        results[label] = dt
        log(f"{label:28s}: {dt * 1e3:7.2f} ms/step "
            f"({rows_per_step / dt / 1e6:6.0f} Mrows/s nominal)")

    # -- hop-faithful floor --------------------------------------------------
    # mirror the kernel's EXACT dataflow: layer 1 gathers from the scan
    # slice of the stacked table (f32 user stack = 37.7 MB -> past the
    # gather cliff, same as the kernel's first hop), layer 2 gathers from
    # a COMPUTED [N, D] table (the residual output, under-cliff — the
    # kernel's second hop), every [E, D] message buffer is written
    # (barrier) and fully read back (the segment-sum's stream) — only the
    # MXU one-hot dots and the output scatter are missing. This is the
    # structural floor a segment-sum consumer could conceivably reach.
    def make_hop_faithful(exact):
        def hop_faithful(u_emb, i_emb, plans):
            def one(_, inp):
                u0, i0, pu, pi = inp
                if not exact:
                    u0 = u0.astype(jnp.bfloat16)
                    i0 = i0.astype(jnp.bfloat16)
                embs0, embs1 = [u0], [i0]
                for _l in range(GNN_LAYER):
                    m0 = jax.lax.optimization_barrier(
                        jnp.take(embs1[-1], pu["src"], axis=0))
                    # [:N] stands in for the segment-sum's [N, D] output;
                    # + 0*sum() forces the full [E, D] readback the real
                    # kernel performs
                    a0 = m0[:u0.shape[0]] + (m0.sum() * 0).astype(u0.dtype)
                    m1 = jax.lax.optimization_barrier(
                        jnp.take(embs0[-1], pi["src"], axis=0))
                    a1 = m1[:i0.shape[0]] + (m1.sum() * 0).astype(i0.dtype)
                    embs0.append(a0 + embs0[-1])
                    embs1.append(a1 + embs1[-1])
                return None, (sum(embs0[1:], embs0[0]).sum()
                              .astype(jnp.float32),
                              sum(embs1[1:], embs1[0]).sum()
                              .astype(jnp.float32))

            _, (uv, iv) = jax.lax.scan(one, None,
                                       (u_emb, i_emb, plans["u"],
                                        plans["i"]))
            return uv.sum() + iv.sum()
        return hop_faithful

    for label, exact in (("hop-faithful f32", True),
                         ("hop-faithful bf16", False)):
        fn = make_hop_faithful(exact)
        dt, _ = _time_fn(_chain_steps(fn), u_emb, i_emb, plans, iters=3)
        dt /= CHAIN
        results[label] = dt
        log(f"{label:28s}: {dt * 1e3:7.2f} ms/step "
            f"({rows_per_step / dt / 1e6:6.0f} Mrows/s nominal)")

    # -- pure plan-sorted gather rate (DESIGN §3 calibration, this shape) ---
    # gather WITHOUT the barrier: XLA fuses the sum into the gather, so
    # the [E, D] stream never materializes — rows/dt is the pure fetch
    # rate the 316 Mrows/s claim is about
    def make_pure(exact):
        def pure(u_emb, i_emb, plans):
            acc = jnp.float32(0.0)
            for g in range(GRAPH_NUM):
                u0 = jax.lax.optimization_barrier(u_emb[g])
                i0 = jax.lax.optimization_barrier(i_emb[g])
                if not exact:
                    u0 = u0.astype(jnp.bfloat16)
                    i0 = i0.astype(jnp.bfloat16)
                pu = {k: v[g] for k, v in plans["u"].items()}
                pi = {k: v[g] for k, v in plans["i"].items()}
                for _l in range(GNN_LAYER):
                    iop = i0 + acc.astype(i0.dtype) * 1e-30
                    uop = u0 + acc.astype(u0.dtype) * 1e-30
                    acc = acc + jnp.take(iop, pu["src"], axis=0).sum() \
                        .astype(jnp.float32)
                    acc = acc + jnp.take(uop, pi["src"], axis=0).sum() \
                        .astype(jnp.float32)
            return acc
        return pure

    for label, exact in (("pure-fetch f32", True), ("pure-fetch bf16",
                                                    False)):
        dt, _ = _time_fn(_chain_steps(make_pure(exact)), u_emb, i_emb,
                         plans, iters=3)
        dt /= CHAIN
        results[label] = dt
        log(f"{label:28s}: {dt * 1e3:7.2f} ms/step "
            f"({rows_per_step / dt / 1e6:6.0f} Mrows/s)")

    # -- structural floors --------------------------------------------------
    stream_bw = 340e9  # measured chip stream bandwidth (DESIGN §3)
    for label, exact in (("f32", True), ("bf16", False)):
        fetch = results[f"pure-fetch {label}"]
        bytes_per_el = 4 if exact else 2
        stream = 2 * rows_per_step * LATDIM * bytes_per_el / stream_bw
        floor = fetch + stream
        log(f"floor[{label}]: fetch {fetch*1e3:.1f} + [E,D] stream "
            f"{stream*1e3:.1f} = {floor*1e3:.1f} ms")
        results[f"floor {label}"] = floor

    import json
    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
