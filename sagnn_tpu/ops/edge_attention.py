"""Edge-scored (GAT-style) propagation: SDDMM → edge softmax → weighted SpMM.

The reference has no attention over graph edges — its propagation is an
unweighted sum (model.py:80-92, SURVEY.md Q1/Q2). This module is the
library-completeness variant the SDDMM kernel enables: per-edge scores from
the endpoint embeddings, normalized per target node, driving a weighted
aggregation. All three stages are TPU-shaped:

  scores  = sddmm(x_src, x_tgt) / sqrt(D)     (Pallas, MXU one-hot gather)
  weights = edge_softmax(scores, tgt)         (XLA sorted segment ops, 1-D)
  out     = spmm_weighted(x_src, weights)     (Pallas, weights ride the
                                               one-hot operand — zero cost)

Gradients flow end-to-end: sddmm and spmm_weighted carry custom VJPs that
are each other's duals; edge_softmax differentiates through XLA.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sagnn_tpu.ops.spmm_pallas import sddmm, spmm_weighted


def edge_softmax(scores: jax.Array, tgt: jax.Array, num_tgt: int,
                 mask: jax.Array | None = None,
                 sorted_targets: bool = True) -> jax.Array:
    """Per-target-node softmax over incoming-edge scores.

    scores: [E] canonical-order edge scores; tgt: [E] target ids with
    padding == num_tgt (or any masked id); mask: [E] 1.0 for real edges
    (padding edges get weight 0 — they also score 0 out of sddmm, but
    masking keeps the denominator honest when a pad edge shares the dump
    row). sorted_targets=False allows unsorted tgt — needed when the
    canonical edge order is the OTHER direction's sort (the model's
    item-target hop under one shared canonical order).
    """
    if mask is not None:
        scores = jnp.where(mask > 0, scores, -jnp.inf)
    m = jax.ops.segment_max(scores, tgt, num_segments=num_tgt + 1,
                            indices_are_sorted=sorted_targets)
    # empty segments produce -inf max; keep the exp argument finite
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    z = jnp.exp(scores - jnp.take(m, tgt))
    if mask is not None:
        z = z * mask
    denom = jax.ops.segment_sum(z, tgt, num_segments=num_tgt + 1,
                                indices_are_sorted=sorted_targets)
    return z / jnp.maximum(jnp.take(denom, tgt), 1e-9)


def attention_propagate(x_src: jax.Array, x_tgt: jax.Array,
                        tgt: jax.Array, fwd_arrays: Tuple,
                        bwd_arrays: Tuple, fwd_nb: int, fwd_nt: int,
                        bwd_nb: int, bwd_nt: int,
                        mask: jax.Array | None = None,
                        temperature: float | None = None,
                        exact: bool = True,
                        sorted_targets: bool = True) -> jax.Array:
    """One attention-weighted hop: out[t] = Σ_e softmax_t(s_e)·x_src[src_e].

    x_src [N_src, D], x_tgt [N_tgt, D]; tgt [E] canonical-order target ids
    (the u_tgt/i_tgt padded arrays); plan tuples as in ops.spmm_pallas
    (edge-tracked, 6 arrays each). temperature defaults to sqrt(D).
    """
    d = x_src.shape[-1]
    temp = float(d) ** 0.5 if temperature is None else temperature
    scores = sddmm(x_src, x_tgt, fwd_arrays, bwd_arrays, fwd_nb, fwd_nt,
                   bwd_nb, bwd_nt, exact) / temp
    w = edge_softmax(scores, tgt, fwd_nt, mask=mask,
                     sorted_targets=sorted_targets)
    return spmm_weighted(x_src, w, fwd_arrays, bwd_arrays, fwd_nb, fwd_nt,
                         bwd_nb, bwd_nt, exact)
