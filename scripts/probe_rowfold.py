"""Probe: ROW-FOLDED gathers for the exact-f32 1M-node memory deficit.

DESIGN.md §8: at 1M nodes the gather path's {2,1,0:T(8,128)} relayout
lane-pads D=64 f32 table rows to 128 lanes — 2.0x expansion, 1.34 GB of
pure padding across both tables, and exact-f32 training is 313 MB over
HBM. Bitcast-bf16 views and stored-layout pinning both probed negative.

This probe measures the remaining idea (VERDICT r2 #2): reshape the table
[N, 64] -> [N/2, 128] (row-major contiguous, so the reshape is logical),
gather row src//2 (512 B rows, zero lane padding), and select the correct
64-lane half by src parity post-gather. Two questions decide it:

  1. RATE: row-gathers measured latency-bound and width-INDEPENDENT from
     64-256 B/row — does that hold at 512 B? (If yes, folded gathers cost
     the same; the parity select is a stream-bound VPU pass over [E, 128].)
  2. MEMORY: does XLA's relayout copy of the folded [N/2, 128] operand
     actually drop the padding? (memory_analysis temps of a fwd+bwd
     gather program, folded vs unfolded.)

Run ON THE CHIP: python scripts/probe_rowfold.py
Prints one JSON line; numbers go to DESIGN.md §8.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN = 8
ITERS = 8
E = 4_000_000
D = 64


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    out = {"metric": "rowfold_probe", "edges": E, "latdim": D}

    def timeit(fn, *args):
        v = float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            v = float(fn(*args))
        return (time.perf_counter() - t0) / ITERS / CHAIN

    def chain(body):
        @jax.jit
        def chained(x, idx):
            def outer(c, _):
                return c * 1e-20 + body(x + c * 1e-12, idx), None
            c, _ = jax.lax.scan(outer, jnp.float32(0.0), None, length=CHAIN)
            return c
        return chained

    # -- 1. gather rate, both regimes (below/above the 32 MB cliff) --------
    for regime, N in (("fast_64k", 65_536), ("slow_1M", 1_048_576)):
        x = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
        src = jnp.asarray(rng.integers(0, N, E, dtype=np.int32))

        def plain(x, src):
            return jnp.take(x, src, axis=0).sum()

        def folded(x, src):
            xf = x.reshape(N // 2, 2 * D)
            g = jnp.take(xf, src // 2, axis=0)          # [E, 128], 512 B/row
            half = jnp.where((src % 2 == 1)[:, None], g[:, D:], g[:, :D])
            return half.sum()

        dt_p = timeit(chain(plain), x, src)
        dt_f = timeit(chain(folded), x, src)
        out[f"{regime}_plain_ms"] = round(dt_p * 1e3, 2)
        out[f"{regime}_folded_ms"] = round(dt_f * 1e3, 2)
        out[f"{regime}_plain_Mrows_s"] = round(E / dt_p / 1e6)
        out[f"{regime}_folded_Mrows_s"] = round(E / dt_f / 1e6)
        print(f"{regime}: plain {dt_p*1e3:.2f} ms ({E/dt_p/1e6:.0f} Mrows/s)"
              f"  folded {dt_f*1e3:.2f} ms ({E/dt_f/1e6:.0f} Mrows/s)",
              file=sys.stderr)

    # -- 2. relayout-copy footprint: fwd+bwd through the gather ------------
    # mirrors the train step's shape: node-minor-preferred consumers (the
    # sum standing in for fusion/Adam) + the gather; grad forces both the
    # forward relayout copy and the backward scatter into existence
    N = 1_048_576
    x_s = jax.ShapeDtypeStruct((N, D), jnp.float32)
    i_s = jax.ShapeDtypeStruct((E,), jnp.int32)

    def mem_of(fn):
        c = jax.jit(fn).lower(x_s, i_s).compile()
        ma = c.memory_analysis()
        return ma.temp_size_in_bytes

    def loss_plain(x, src):
        return jnp.take(x, src, axis=0).sum() + (x * x).sum()

    def loss_folded(x, src):
        xf = x.reshape(N // 2, 2 * D)
        g = jnp.take(xf, src // 2, axis=0)
        half = jnp.where((src % 2 == 1)[:, None], g[:, D:], g[:, :D])
        return half.sum() + (x * x).sum()

    t_plain = mem_of(jax.grad(loss_plain))
    t_fold = mem_of(jax.grad(loss_folded))
    out["grad_temps_plain_mb"] = round(t_plain / 2 ** 20)
    out["grad_temps_folded_mb"] = round(t_fold / 2 ** 20)
    print(f"grad temps: plain {t_plain/2**20:.0f} MB, "
          f"folded {t_fold/2**20:.0f} MB", file=sys.stderr)

    # -- verdict helper ----------------------------------------------------
    slow_ratio = out["slow_1M_folded_ms"] / out["slow_1M_plain_ms"]
    out["slow_regime_time_ratio"] = round(slow_ratio, 3)
    out["mem_saving_mb"] = out["grad_temps_plain_mb"] \
        - out["grad_temps_folded_mb"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
