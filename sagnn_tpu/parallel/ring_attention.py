"""Ring self-attention: sequence-parallel MHSA over the mesh's ICI ring.

The reference has no sequence parallelism of any kind — sequences are
truncated to pos_length=200 and the parity-mode sequence branch pools the
whole sequence into one token before attention (SURVEY.md §5 long-context,
quirk Q3). This module is the growth path SURVEY.md names for the faithful
per-token variant (`per_token_seq_attention=True`): blockwise attention with
the sequence axis sharded over a mesh axis and K/V blocks rotating between
ICI neighbors.

Design (Liu & Abbeel ring attention, adapted to this model's
bidirectional masked attention — no causality, no positional bias inside
the attention):

  - Each device keeps its Q block [B, L/P, D] resident and accumulates a
    streaming (flash-style) softmax: running row-max `m`, denominator `l`,
    numerator `acc`.
  - K/V/mask blocks hop around the ring via `ppermute`, issued BEFORE the
    local block's attention work so the transfer rides ICI concurrently
    with compute (same latency-hiding pattern as
    edge_partition.ring_spmm_arrays).
  - P-1 permuted steps + one final local step — the last rotation is
    never sent.

Numerics match `ops.attention.multi_head_self_attention(stable=True,
mask=...)` exactly up to f32 summation order: masked keys contribute
exp(-1e30 - m) and the streaming max-rescale reproduces the max-subtracted
softmax. Differentiable through shard_map/scan AD (ppermute transposes to
the reverse ring).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG = -1e30  # masked-logit value, matching ops.attention


def _local_ring_attention(params: Dict[str, jax.Array], x: jax.Array,
                          mask: jax.Array, num_heads: int, axis: str,
                          ring_size: int,
                          vary_axes: tuple = ()) -> jax.Array:
    """Per-device body: x [B, Lq, D] local block, mask [B, Lq] local."""
    B, Lq, D = x.shape
    dk = D // num_heads
    scale = 1.0 / jnp.sqrt(jnp.float32(dk))
    xf = x.astype(jnp.float32)

    def heads(y):  # [B, L, D] -> [B, H, L, dk]
        return y.reshape(B, -1, num_heads, dk).transpose(0, 2, 1, 3)

    q = heads(xf @ params["wq"] + params["bq"])
    k = heads(xf @ params["wk"] + params["bk"])
    v = heads(xf @ params["wv"] + params["bv"])

    perm = [(i, (i + 1) % ring_size) for i in range(ring_size)]

    def accumulate(k_blk, v_blk, m_blk, m, l, acc):
        logits = jnp.einsum("bhqd,bhsd->bhqs", q, k_blk,
                            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(m_blk[:, None, None, :] > 0, logits, NEG)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        r = jnp.exp(m - m_new)                       # [B, H, Lq]
        p = jnp.exp(logits - m_new[..., None])       # [B, H, Lq, Ls]
        l = l * r + jnp.sum(p, axis=-1)
        acc = acc * r[..., None] + jnp.einsum(
            "bhqs,bhsd->bhqd", p, v_blk, preferred_element_type=jnp.float32)
        return m_new, l, acc

    def body(carry, _):
        k_blk, v_blk, m_blk, m, l, acc = carry
        # send early: the ppermute rides ICI while this block is reduced
        k_nxt = jax.lax.ppermute(k_blk, axis, perm)
        v_nxt = jax.lax.ppermute(v_blk, axis, perm)
        mk_nxt = jax.lax.ppermute(m_blk, axis, perm)
        m, l, acc = accumulate(k_blk, v_blk, m_blk, m, l, acc)
        return (k_nxt, v_nxt, mk_nxt, m, l, acc), None

    m0 = jnp.full((B, num_heads, Lq), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, num_heads, Lq), jnp.float32)
    acc0 = jnp.zeros((B, num_heads, Lq, dk), jnp.float32)
    if ring_size > 1:
        # fresh zeros are replicated; mark them device-varying over every
        # axis the data inputs vary on (the ring axis, plus the batch axis
        # when sharded) or the scan's carry types disagree (shard_map vma
        # typing)
        m0, l0, acc0 = (jax.lax.pcast(t, vary_axes, to="varying")
                        for t in (m0, l0, acc0))
        (k_blk, v_blk, m_blk, m, l, acc), _ = jax.lax.scan(
            body, (k, v, mask, m0, l0, acc0), None, length=ring_size - 1)
        # final local step: no wasted last rotation
        m, l, acc = accumulate(k_blk, v_blk, m_blk, m, l, acc)
    else:
        # degenerate single-device ring: one local step, no collectives
        # (the scan body must not even be traced — its ppermute would
        # reference an unbound axis)
        m, l, acc = accumulate(k, v, mask, m0, l0, acc0)

    out = acc / jnp.maximum(l, 1e-38)[..., None]     # [B, H, Lq, dk]
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, D).astype(x.dtype)


def ring_multi_head_self_attention(mesh: Mesh, params: Dict[str, jax.Array],
                                   x: jax.Array, num_heads: int,
                                   mask: jax.Array, axis: str = "model",
                                   batch_axis: str = "data") -> jax.Array:
    """Sequence-parallel drop-in for multi_head_self_attention(stable=True).

    x: [B, L, D] global; the sequence axis is sharded over `axis` (L must
    divide by mesh.shape[axis]); mask: [B, L] key-validity (1 = valid).
    QKV projections run locally per shard (weights replicated); attention
    streams K/V blocks around the ring. The batch axis stays sharded over
    `batch_axis` (the ring never communicates across it). Returns
    [B, L, D] with the same layout as x.
    """
    ring_size = mesh.shape[axis]
    L = x.shape[1]
    assert L % ring_size == 0, (
        f"sequence length {L} must divide the '{axis}' axis ({ring_size})")
    if ring_size == 1:
        # degenerate ring: still runs (scan length 0 + final step) but
        # skip the shard_map machinery
        return _local_ring_attention(params, x, mask, num_heads, axis="",
                                     ring_size=1)

    b = batch_axis if batch_axis in mesh.shape else None
    vary = (axis,) if b is None else (axis, b)
    fn = shard_map(
        lambda p, xb, mb: _local_ring_attention(p, xb, mb, num_heads, axis,
                                                ring_size, vary_axes=vary),
        mesh=mesh,
        in_specs=(P(), P(b, axis, None), P(b, axis)),
        out_specs=P(b, axis, None),
    )
    return fn(params, x, mask)
