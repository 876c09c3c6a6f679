"""Message propagation: gather + sorted segment-sum (the SpMM).

Reference semantics (model.py:80-92 `messagePropagate`):
    srcEmbeds = embedding_lookup(srclats, srcNodes)
    lat = pad(segment_sum(srcEmbeds, tgtNodes), 100 rows)
    lat = embedding_lookup(lat, range(num_targets))
    return leakyRelu(lat)

i.e. an UNWEIGHTED sum over in-edges (SURVEY.md Q1/Q2: edge values and
normalization are dead in the reference) followed by the activation. The
pad-100-then-gather hack exists only to fix segment_sum's output size; we
instead pass `num_segments` directly.

Padding convention (data/graph.py): padded edges carry tgt == num_targets,
so we aggregate into num_targets+1 segments and drop the dump row. Target
ids are sorted ascending, which we declare to XLA via indices_are_sorted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_segment_sum(src_emb: jax.Array, src: jax.Array, tgt: jax.Array,
                       num_tgt: int,
                       weights: jax.Array | None = None) -> jax.Array:
    """out[t, :] = sum_{e: tgt[e]==t} w[e] * src_emb[src[e], :].

    src_emb: [N_src, D]; src, tgt: [E] int32 (tgt sorted asc, pad = num_tgt);
    returns [num_tgt, D].
    """
    msgs = jnp.take(src_emb, src, axis=0)
    if weights is not None:
        msgs = msgs * weights[:, None]
    agg = jax.ops.segment_sum(
        msgs, tgt, num_segments=num_tgt + 1, indices_are_sorted=True)
    return agg[:num_tgt]


def propagate(src_emb: jax.Array, src: jax.Array, tgt: jax.Array,
              num_tgt: int, leaky: float,
              weights: jax.Array | None = None) -> jax.Array:
    """One reference propagation hop incl. the leaky-relu (model.py:92)."""
    agg = gather_segment_sum(src_emb, src, tgt, num_tgt, weights)
    return jnp.maximum(leaky * agg, agg)


def edge_dropout_weights(key: jax.Array, num_edges: int, keep_rate: float,
                         base: jax.Array | None = None) -> jax.Array:
    """FUNCTIONAL edge dropout for the non-parity variant: Bernoulli edge
    mask scaled by 1/keep (what the reference's edgeDropout MEANT to do
    before the int cast + value-ignoring propagation neutered it — SURVEY.md
    Q1, model.py:93-102). Returns [E] weights to pass to `propagate`."""
    mask = jax.random.bernoulli(key, keep_rate, (num_edges,))
    w = mask.astype(jnp.float32) / keep_rate
    return w if base is None else w * base
