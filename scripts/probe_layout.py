"""Probe: does pinning the node-table device layout change row-gather rate
(esp. past the ~32 MB slow-gather cliff) or remove relayout copies?

DESIGN.md §8 ends with "the next lever would be pinning the stored param
layout to the gather layout" — this measures whether that lever exists on
this toolchain (jax 0.9 `jax.experimental.layout`).

Variants per table size (below/above the 32 MB cliff):
  default   — XLA-chosen layout (auto)
  t8x128    — explicit major_to_minor=(0,1), tiling ((8,128),)  [the default]
  t1x128    — tiling ((1,128),): one row per tile, so a row-gather touches
              a 1-sublane tile instead of an 8-sublane one
  t8x128pad — tiling ((8,128),(1,1)): explicit no-op second-level tile

Timing: chained data-dependent steps inside one jit (relay latency ~16 ms
per dispatch; see CLAUDE.md).

    python scripts/probe_layout.py            # run on the TPU
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


D = 64
E = 4_000_000
CHAIN = 4
ITERS = 3


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    dev = jax.devices()[0]
    log(f"device: {dev}")
    rng = np.random.default_rng(0)

    def run_one(num_rows: int, fmt, name: str) -> float:
        x_np = rng.standard_normal((num_rows, D)).astype(np.float32)
        idx_np = rng.integers(0, num_rows, E, dtype=np.int32)
        idx = jnp.asarray(idx_np)

        def chained(x, idx):
            def step(c, _):
                g = jnp.take((x + c * 1e-12), idx, axis=0)
                return g.sum() * 1e-20, None
            c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=CHAIN)
            return c

        in_sh = (fmt, None) if fmt is not None else None
        fn = (jax.jit(chained, in_shardings=in_sh) if in_sh is not None
              else jax.jit(chained))
        x = jax.device_put(x_np, fmt) if fmt is not None \
            else jnp.asarray(x_np)
        v = float(fn(x, idx))  # compile+warmup
        t0 = time.perf_counter()
        for _ in range(ITERS):
            v = float(fn(x, idx))
        dt = (time.perf_counter() - t0) / ITERS / CHAIN
        rate = E / dt / 1e6
        mb = num_rows * D * 4 / 1e6
        log(f"  {name:10s} table {mb:7.1f} MB: {dt*1e3:7.2f} ms "
            f"-> {rate:6.1f} Mrows/s")
        return rate

    sharding = jax.sharding.SingleDeviceSharding(dev)
    variants = [("default", None)]
    for name, tiling in [("t8x128", ((8, 128),)),
                         ("t1x128", ((1, 128),)),
                         ("t8x512", ((8, 512),))]:
        try:
            variants.append(
                (name, Format(Layout(major_to_minor=(0, 1), tiling=tiling),
                              sharding)))
        except Exception as e:  # API shape differs: record and move on
            log(f"  {name}: Format construction failed: {e}")

    for num_rows in (65_536, 262_144, 1_048_576):
        log(f"table rows = {num_rows}")
        for name, fmt in variants:
            try:
                run_one(num_rows, fmt, name)
            except Exception as e:
                log(f"  {name:10s} FAILED: {type(e).__name__}: "
                    f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
