"""Shared catalog-chunking policy + local-column scatter masks.

Both patterns appear in every streamed catalog surface (serving chunked
top-k, sharded top-k, streaming full-sort eval, dense recommend): keeping
them here prevents the four call sites from drifting apart — in particular
the negative-offset wrap hazard documented on scatter_local_mask.
"""

from __future__ import annotations

import jax.numpy as jnp

# One policy for "when to stream a catalog, and how wide": dense scoring
# up to DENSE_MAX_ROWS rows per device ([B, rows] f32 stays ~134 MB at
# B=256), streamed in AUTO_CHUNK_ROWS chunks past it. Retune HERE only.
DENSE_MAX_ROWS = 131_072
AUTO_CHUNK_ROWS = 65_536


def auto_chunk_rows(n_rows: int) -> int:
    """Resolve the auto (0) chunk setting: -1 = score densely,
    >0 = stream in chunks of this many rows."""
    return AUTO_CHUNK_ROWS if n_rows > DENSE_MAX_ROWS else -1


def scatter_local_mask(ids: jnp.ndarray, base, width: int,
                       valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """[B, width] bool: True at local column (ids - base) for every id that
    lands inside [base, base + width), optionally gated by `valid` > 0.

    ids: [B, K] global ids; base: scalar (static or traced) window start.

    NB: ids from outside the window give NEGATIVE local offsets, which
    jnp `.at[]` would WRAP numpy-style BEFORE any mode="drop" OOB check —
    silently masking the wrong columns. This helper masks the range
    explicitly and clips, so every caller inherits the fix.
    """
    B, K = ids.shape
    loc = ids - base
    ok = (loc >= 0) & (loc < width)
    if valid is not None:
        ok = ok & (valid > 0)
    rows = jnp.repeat(jnp.arange(B), K)
    return jnp.zeros((B, width), jnp.bool_).at[
        rows, jnp.clip(loc, 0, width - 1).reshape(-1)].max(ok.reshape(-1))
