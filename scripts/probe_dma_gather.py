"""Probe: in-kernel manual-DMA row gather — the last structural SpMM lever.

DESIGN.md §3: the Pallas SpMM keeps the row gather in XLA, which writes an
[E, D] message stream to HBM that the kernel immediately reads back —
2·E·256 B of avoidable traffic. Mosaic's dynamic_gather cannot replace it
(one 8-sublane tile, probed). The remaining idea (VERDICT r3 #1): the
kernel fetches its OWN rows with double-buffered `pltpu.make_async_copy`
DMAs from the HBM-resident table, driven by the scalar-prefetched src
indices — removing the round trip entirely.

Decision math (bench shape, D=64): the current path costs per edge
    gather 1/316 Mrows/s = 3.16 ns  +  stream 2·rowB/340 GB/s
      (f32: +1.50 ns; bf16: +0.75 ns)
while a fused kernel costs 1/dma_rows_per_s. So the fused kernel WINS only
if the sustained in-kernel DMA fetch rate exceeds
    f32:  1/(3.16+1.50) ns = 214 Mrows/s
    bf16: 1/(3.16+0.75) ns = 256 Mrows/s
(plan-sorted gathers; fully random raises the bar to ~1/(3.70+s)).
Host-planned run-coalescing (one strided DMA per run of CONSECUTIVE
sources) divides the issue count by the measured run factor, so the
effective bar drops by that factor — also measured here from real plan
source streams at both fills.

This probe measures, ON THE CHIP:
  1. dma_rows_per_s: rows/s of a Pallas kernel that fetches C rows/chunk
     by per-row DMA into VMEM scratch (NBUF outstanding; NBUF swept) and
     reduces them — vs the same-shape XLA gather baseline.
  2. width scaling: 256 B vs 512 B vs 1 KB rows (folded tables) — is the
     DMA path issue-bound (flat rows/s) or bandwidth-bound?
  3. run length: [L, D]-row strided DMAs at L=4/16 — the coalescing rate.
  4. coalescing factor available in REAL plans: mean edges per
     consecutive-source run in plan_spmm chunk streams at the dense bench
     fill and the gowalla-like fill.

Run: python scripts/probe_dma_gather.py   (needs the real chip)
Prints one JSON line; numbers go to DESIGN.md §3.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE = bool(os.environ.get("SMOKE"))   # tiny CPU-interpret shape check
ITERS = 1 if SMOKE else 6
CHAIN = 2 if SMOKE else 4
C = 256 if SMOKE else 1024   # rows fetched per grid step (chunk)


def run_coalescing_factor(src_sorted_chunks: np.ndarray) -> float:
    """Mean edges per run of CONSECUTIVE-OR-EQUAL source ids (a run maps to
    one strided DMA of the covered row range)."""
    total_edges = 0
    total_runs = 0
    for chunk in src_sorted_chunks:
        d = np.diff(chunk)
        runs = 1 + int(((d != 0) & (d != 1)).sum())
        total_edges += len(chunk)
        total_runs += runs
    return total_edges / max(total_runs, 1)


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    out = {"metric": "dma_gather_probe", "chunk": C}

    def timeit(fn, *args):
        v = float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            v = float(fn(*args))
        del v
        return (time.perf_counter() - t0) / ITERS / CHAIN

    def chain(body):
        @jax.jit
        def chained(x, idx):
            def outer(c, _):
                return c * 1e-20 + body(x + c * 1e-12, idx), None
            c, _ = jax.lax.scan(outer, jnp.float32(0.0), None, length=CHAIN)
            return c
        return chained

    # ------------------------------------------------------------------
    # Kernel: per grid step, fetch C rows by row-DMA into scratch, reduce.
    # ------------------------------------------------------------------
    def dma_kernel(src_ref, table_ref, out_ref, scratch, sems, *,
                   nbuf: int, run: int):
        c = pl.program_id(0)

        def get_dma(i):
            idx = src_ref[c, i]
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(idx, run), :],
                scratch.at[pl.ds(i * run, run), :],
                sems.at[i % nbuf],
            )

        n = scratch.shape[0] // run

        def warm(i, _):
            get_dma(i).start()
            return 0

        jax.lax.fori_loop(0, min(nbuf, n), warm, 0)

        def body(i, _):
            get_dma(i).wait()
            nxt = i + nbuf

            @pl.when(nxt < n)
            def _():
                get_dma(nxt).start()
            return 0

        jax.lax.fori_loop(0, n, body, 0)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:] += jnp.sum(scratch[:], axis=0, keepdims=True)

    def make_dma_gather(n_rows: int, d: int, nc: int, nbuf: int,
                        run: int = 1):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,          # src indices [nc, C//run]
            grid=(nc,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((8, d), lambda c, src: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((C, d), jnp.float32),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
        )
        kernel = pl.pallas_call(
            functools.partial(dma_kernel, nbuf=nbuf, run=run),
            grid_spec=grid_spec,
            interpret=jax.default_backend() == "cpu",
            out_shape=jax.ShapeDtypeStruct((8, d), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=pl.CostEstimate(
                flops=nc * C * d,
                bytes_accessed=nc * C * d * 4,
                transcendentals=0,
            ),
        )

        def body(x, idx):
            return kernel(idx, x).sum()
        return body

    # ------------------------------------------------------------------
    # 1+2. DMA tile-fetch rate vs XLA gather, granularity + NBUF sweeps
    # ------------------------------------------------------------------
    # NB: Mosaic rejects DMA slices smaller than one (8, 128) tile
    # ("Slice shape along dimension {1,0} must be aligned to tiling"), so
    # neither a 256 B row (D=64) nor a single 512 B folded row can be
    # row-DMA'd — the MINIMUM in-kernel fetch granularity is an aligned
    # 4 KB tile of the folded [N/2, 128] table, covering 16 logical D=64
    # rows. The viable design is therefore a TILE gather with host-planned
    # tile dedup; what decides it is (a) the sustained tile-DMA issue
    # rate and (b) how many edges share a 16-row tile at real fills.
    # E is capped by SMEM: the scalar-prefetched tile-start array lives in
    # SMEM (1.00 MB total on this chip — probed OOM at 2M/run=8, 144 B
    # over), so E/run_min * 4 B must stay well under 1 MB.
    E = 8_192 if SMOKE else 1_048_576
    NC = E // C
    N = 8_192 if SMOKE else 1_048_576  # 256 MB table at D=64 (big-graph)
    d = 128                            # folded layout: [N/2, 128] f32
    n = N // 2
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    src_np = rng.integers(0, n - 16, E, dtype=np.int32)
    # plan-sorted-like: ascending within each chunk (the planner sorts
    # sources within target blocks)
    src_sorted = np.sort(src_np.reshape(NC, C), axis=1)
    src = jnp.asarray(src_sorted)

    def xla_gather(x, idx):
        return jnp.take(x, idx.reshape(-1), axis=0).sum()

    dt = timeit(chain(xla_gather), x, src)
    out["xla_gather_512B_Mrows_s"] = round(E / dt / 1e6, 1)

    # tile DMAs: `run` consecutive 128-lane rows per DMA, 8-aligned starts
    for run, nbufs in ((8, (4, 8, 16, 32)), (16, (16,)), (32, (16,)),
                       (64, (16,))):
        per_chunk = C // run
        starts = rng.integers(0, (n - run) // 8, NC * per_chunk,
                              dtype=np.int32) * 8
        starts = np.sort(starts.reshape(NC, per_chunk), axis=1)
        idx = jnp.asarray(starts)
        for nbuf in nbufs:
            fn = make_dma_gather(n, d, NC, nbuf, run=run)
            dt = timeit(chain(fn), x, idx)
            key = f"dma_run{run}_nbuf{nbuf}"
            out[key + "_Missues_s"] = round(NC * per_chunk / dt / 1e6, 2)
            out[key + "_GB_s"] = round(NC * per_chunk * run * d * 4
                                       / dt / 1e9, 1)

    # ------------------------------------------------------------------
    # 4. tile-sharing factors in REAL plan chunk streams: edges per
    #    distinct aligned 16-logical-row window (one 4 KB folded tile) per
    #    chunk, and per 32/64-row window (run=16/32 tiles)
    # ------------------------------------------------------------------
    from sagnn_tpu.ops.spmm_pallas import plan_spmm

    def plan_factors(num_src, num_tgt, edges, name):
        src = rng.integers(0, num_src, edges, dtype=np.int32)
        tgt = np.sort(rng.integers(0, num_tgt, edges, dtype=np.int32))
        p = plan_spmm(src, tgt, num_tgt, num_edges=edges)
        chunks = p.src.reshape(p.num_chunks, -1)
        real = p.tgt_local < 128
        streams = [c[m] for c, m in zip(chunks, real) if m.any()]
        out[f"run_factor_{name}"] = round(run_coalescing_factor(streams), 3)
        for w in (16, 32, 64):
            e = sum(len(s) for s in streams)
            t = sum(len(np.unique(s // w)) for s in streams)
            out[f"tile{w}_factor_{name}"] = round(e / max(t, 1), 3)

    sc = 100 if SMOKE else 1
    plan_factors(40_960 // sc, 40_960 // sc, 4_000_000 // sc, "bench_fill")
    plan_factors(41_000 // sc, 49_000 // sc, 1_000_000 // sc,
                 "gowalla_fill")

    # ------------------------------------------------------------------
    # Verdict: a fused tile-gather kernel replaces, per edge,
    #   3.16 ns gather + 0.75/1.50 ns (bf16/f32) stream round-trip
    # with (1/tile_issue_rate + tile_bytes/340GB/s... the DMA rate row
    # already folds bandwidth in) / tile_factor. Compute effective
    # per-edge ns for the best measured config at each fill.
    # ------------------------------------------------------------------
    best_issue = max(v * 1e6 for k, v in out.items()
                     if k.startswith("dma_run8_") and
                     k.endswith("_Missues_s"))
    for name in ("bench_fill", "gowalla_fill"):
        f = out.get(f"tile16_factor_{name}", 1.0)
        eff_ns = 1e9 / best_issue / f
        out[f"fused_eff_ns_per_edge_{name}"] = round(eff_ns, 2)
    out["current_ns_per_edge_f32"] = 4.66
    out["current_ns_per_edge_bf16"] = 3.91
    best_eff = min(out["fused_eff_ns_per_edge_bench_fill"],
                   out["fused_eff_ns_per_edge_gowalla_fill"])
    out["verdict"] = ("VIABLE — build the fused tile-gather kernel"
                      if best_eff < 3.91 else
                      "NEGATIVE — fused tile-gather cannot beat the "
                      "XLA-gather path at any measured fill")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
