"""Pallas TPU SpMM: sorted-COO segment-sum as chunked one-hot matmuls.

Why: XLA lowers `segment_sum` to scatter-add, which is serialized on TPU —
measured 72 ms for 4M×64 f32 on this chip vs ~17 ms of pure memory traffic.
This kernel reformulates the sorted segment reduction as MXU work:

  For each chunk of C edges, all of whose targets lie in ONE R-row target
  block:     out_block[R, D] += one_hot(tgt_local)[C, R]^T @ messages[C, D]

The grid walks chunks in order; consecutive chunks mapping to the same
output block revisit it, so Pallas keeps the accumulator tile in VMEM and
flushes once per block (standard revisiting pattern). No scatter anywhere.

The gather (messages = x[src]) stays in XLA — measured bandwidth-bound
(30 ms ≈ streaming limit on this chip), so a kernel could not beat it.

The chunk schedule is built on the host once per graph (`plan_spmm`) since
edge structure is static across training; plans for all intervals are padded
to a common chunk count so one executable serves every interval (same
static-shape discipline as data.graph).

Backward: d/dx of out = A @ x is A^T @ g — the same kernel run with the
transpose edge lists (data.graph emits both directions pre-sorted), wired up
via jax.custom_vjp in `spmm_pair` below. This removes every scatter from the
training step.

Reference semantics replaced: tf.math.segment_sum (model.py:87).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows per output block (one-hot width — MXU lane dim) and default edges
# per chunk (tunable: larger chunks amortize per-grid-step overhead, smaller
# ones waste less padding on sparse target blocks).
R = 128
C = 1024


@dataclass(frozen=True)
class SpmmPlan:
    """Host-built static schedule for one (graph, direction) SpMM.

    src:        [NC*C] int32 — source ids in chunk order (pad: 0)
    tgt_local:  [NC, C] int32 — target id within the chunk's block (pad: R)
    chunk_block:[NC] int32 — output block index per chunk (pad chunks: NB)
    chunk_first:[NC] int32 — 1 if this chunk is the first of its block
    num_blocks: real output blocks (out rows = (num_blocks+1)*R; the +1 is
                the dump block absorbing padding)
    num_tgt:    true target count (out sliced to this)
    """

    src: np.ndarray
    tgt_local: np.ndarray
    chunk_block: np.ndarray
    chunk_first: np.ndarray
    num_blocks: int
    num_tgt: int

    @property
    def num_chunks(self) -> int:
        return self.tgt_local.shape[0]


def plan_spmm(src: np.ndarray, tgt: np.ndarray, num_tgt: int,
              num_edges: int | None = None,
              num_chunks: int | None = None,
              sort_sources: bool = True,
              chunk_size: int = C,
              num_slices: int = 1) -> SpmmPlan:
    """Build the chunk schedule from target-sorted COO edges.

    `src`/`tgt` may carry padding at the end (tgt == num_tgt), which is
    dropped here; `num_edges` gives the true edge count if known.

    sort_sources: reorder edges WITHIN each target block by source id —
    edge order inside a block is free (the one-hot matmul sums regardless),
    and source-sorted chunks give the XLA gather near-sequential access
    patterns instead of fully random ones.
    """
    src = np.asarray(src, np.int32)
    tgt = np.asarray(tgt, np.int32)
    if num_edges is None:
        num_edges = int(np.searchsorted(tgt, num_tgt))
    src, tgt = src[:num_edges], tgt[:num_edges]
    assert (np.diff(tgt) >= 0).all(), "edges must be sorted by target"
    if sort_sources and num_edges:
        order = np.lexsort((src, tgt // R))
        src, tgt = src[order], tgt[order]

    num_blocks = max(1, -(-num_tgt // R))
    blocks = tgt // R if num_edges else np.zeros(0, np.int32)
    # chunk boundaries: every C edges within a block. EVERY block gets at
    # least one chunk — empty blocks get an all-padding chunk whose
    # chunk_first=1 zeroes the output tile (otherwise it would be read back
    # uninitialized from VMEM).
    CS = chunk_size
    chunks_src, chunks_tl, chunk_block, chunk_first = [], [], [], []
    bounds = np.searchsorted(blocks, np.arange(num_blocks + 1))
    for b in range(num_blocks):
        start, end = int(bounds[b]), int(bounds[b + 1])
        if start == end:
            chunks_src.append(np.zeros(CS, np.int32))
            chunks_tl.append(np.full(CS, R, np.int32))
            chunk_block.append(b)
            chunk_first.append(1)
            continue
        for cs in range(start, end, CS):
            ce = min(cs + CS, end)
            s = np.zeros(CS, np.int32)
            tl = np.full(CS, R, np.int32)
            s[: ce - cs] = src[cs:ce]
            tl[: ce - cs] = tgt[cs:ce] - b * R
            chunks_src.append(s)
            chunks_tl.append(tl)
            chunk_block.append(b)
            chunk_first.append(1 if cs == start else 0)

    nc = len(chunk_block)
    target_nc = num_chunks or max(1, nc)
    assert nc <= target_nc, f"plan needs {nc} chunks > padded {target_nc}"
    if num_slices > 1:
        target_nc = -(-target_nc // num_slices) * num_slices
    for _ in range(target_nc - nc):
        chunks_src.append(np.zeros(CS, np.int32))
        chunks_tl.append(np.full(CS, R, np.int32))
        chunk_block.append(num_blocks)  # dump block
        chunk_first.append(1)

    if num_slices > 1:
        # out-of-core slicing (spmm_apply num_slices>1 runs one pallas call
        # per slice and SUMS the partial outputs): the first chunk of every
        # slice must zero its block so each slice computes an independent
        # partial sum for blocks spanning a slice boundary.
        per = target_nc // num_slices
        for s in range(num_slices):
            chunk_first[s * per] = 1

    return SpmmPlan(
        src=np.concatenate(chunks_src).astype(np.int32),
        tgt_local=np.stack(chunks_tl).astype(np.int32),
        chunk_block=np.asarray(chunk_block, np.int32),
        chunk_first=np.asarray(chunk_first, np.int32),
        num_blocks=num_blocks,
        num_tgt=num_tgt,
    )


def _segsum_kernel_init(first_ref, blk_ref, tl_ref, msg_ref, init_ref,
                        out_ref, *, exact: bool):
    """Variant with an aliased zero-initialized output (sliced path): blocks
    a slice never visits keep the zeros of the aliased input."""
    del init_ref  # aliased to out — only its initial contents matter
    _segsum_kernel(first_ref, blk_ref, tl_ref, msg_ref, out_ref, exact=exact)


def _segsum_kernel(first_ref, blk_ref, tl_ref, msg_ref, out_ref, *,
                   exact: bool):
    """One chunk: out_block += one_hot(tgt_local)^T @ messages.

    exact=True forces 3-pass f32 MXU multiplication (the TPU MXU otherwise
    truncates f32 operands to bf16, which breaks segment-sum parity with the
    reference at ~1e-2)."""
    del blk_ref  # consumed by the index maps
    c = pl.program_id(0)
    first = first_ref[c]

    @pl.when(first == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tl = tl_ref[0]                                    # [1, C] int32
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, tl.shape[-1]), 0)
    oh_t = (tl == rows).astype(msg_ref.dtype)         # [R, C] transposed 1-hot
    out_ref[:] += jax.lax.dot_general(
        oh_t, msg_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if exact
                   else jax.lax.Precision.DEFAULT),
    ).astype(out_ref.dtype)


def _segsum_pallas(messages: jax.Array, tgt_local: jax.Array,
                   chunk_block: jax.Array, chunk_first: jax.Array,
                   num_blocks: int, exact: bool = True,
                   zero_init: bool = False) -> jax.Array:
    """messages: [NC*C, D] chunk-ordered; returns [(num_blocks+1)*R, D].

    zero_init=True aliases the output to a fresh zeros buffer so blocks this
    call never visits read back as zero (required by the sliced path, where
    a slice touches only a subset of blocks).
    """
    nc = tgt_local.shape[0]
    cs = tgt_local.shape[-1]
    d = messages.shape[-1]
    tgt_local = tgt_local.reshape(nc, 1, cs)
    out_rows = (num_blocks + 1) * R
    in_specs = [
        pl.BlockSpec((1, 1, cs), lambda c, first, blk: (c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cs, d), lambda c, first, blk: (c, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [chunk_first, chunk_block, tgt_local, messages]
    kernel = _segsum_kernel
    aliases = {}
    if zero_init:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        inputs.append(jnp.zeros((out_rows, d), jnp.float32))
        kernel = _segsum_kernel_init
        aliases = {4: 0}  # zeros input (after 2 prefetch + 2 tensor) -> out
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # chunk_first, chunk_block (used in maps)
        grid=(nc,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, d), lambda c, first, blk: (blk[c], 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(kernel, exact=exact),
        grid_spec=grid_spec,
        # CPU (tests, CI meshes) runs the kernel in interpreter mode
        interpret=jax.default_backend() == "cpu",
        out_shape=jax.ShapeDtypeStruct((out_rows, d), jnp.float32),
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=2 * nc * cs * R * d,
            bytes_accessed=nc * cs * (d * 4 + 4)
            + (num_blocks + 1) * R * d * 4,
            transcendentals=0,
        ),
    )(*inputs)
    return out


def spmm_apply(x: jax.Array, src: jax.Array, tgt_local: jax.Array,
               chunk_block: jax.Array, chunk_first: jax.Array,
               num_blocks: int, num_tgt: int,
               exact: bool = True, num_slices: int = 1) -> jax.Array:
    """out[t] = Σ_{e: tgt[e]=t} x[src[e]] — XLA gather + Pallas segsum.

    exact=False is the throughput path: the node table is cast to bf16
    BEFORE the gather, halving the dominant random-read+stream traffic of
    the [E, D] message stream; accumulation stays f32 in the kernel.

    num_slices>1 is the out-of-core path for huge graphs: only one slice's
    message stream is live at a time (a lax.scan over slices sums partial
    outputs). The plan MUST have been built with the same num_slices so
    slice-leading chunks re-zero their blocks.
    """
    if not exact:
        x = x.astype(jnp.bfloat16)
    if num_slices == 1:
        messages = jnp.take(x, src, axis=0)  # [NC*C, D], bandwidth-bound
        out = _segsum_pallas(messages, tgt_local, chunk_block, chunk_first,
                             num_blocks, exact=exact)
        return out[:num_tgt]

    nc = tgt_local.shape[0]
    cs = tgt_local.shape[-1]
    assert nc % num_slices == 0, (nc, num_slices)
    per = nc // num_slices
    xs = (src.reshape(num_slices, per * cs),
          tgt_local.reshape(num_slices, per, cs),
          chunk_block.reshape(num_slices, per),
          chunk_first.reshape(num_slices, per))

    def body(acc, sl):
        s, tl, cb, cf = sl
        messages = jnp.take(x, s, axis=0)
        out = _segsum_pallas(messages, tl, cb, cf, num_blocks, exact=exact,
                             zero_init=True)
        return acc + out, None

    init = jnp.zeros(((num_blocks + 1) * R, x.shape[-1]), jnp.float32)
    out, _ = jax.lax.scan(body, init, xs)
    return out[:num_tgt]


# ---------------------------------------------------------------------------
# Differentiable SpMM over a fixed bipartite graph (both directions planned)
# ---------------------------------------------------------------------------

def _plan_args(p):
    """SpmmPlan (host) or dict of device arrays -> tuple of device arrays."""
    if isinstance(p, dict):
        return (p["src"], p["tgt_local"], p["chunk_block"],
                p["chunk_first"], int(p["num_blocks"]), int(p["num_tgt"]))
    return (jnp.asarray(p.src), jnp.asarray(p.tgt_local),
            jnp.asarray(p.chunk_block), jnp.asarray(p.chunk_first),
            p.num_blocks, p.num_tgt)


def _float0s(tree):
    return jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), tree)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def spmm(x: jax.Array, fwd_arrays: Tuple, bwd_arrays: Tuple,
         fwd_nb: int, fwd_nt: int, bwd_nb: int, bwd_nt: int,
         exact: bool = True) -> jax.Array:
    """Differentiable A @ x for the fixed sparse A.

    fwd_arrays/bwd_arrays: (src, tgt_local, chunk_block, chunk_first) device
    arrays for A (target-sorted) and A^T (source-sorted) — TRACED args, so
    this composes with lax.scan over stacked per-interval plans; the static
    block/target counts ride nondiff_argnums.
    """
    return spmm_apply(x, *fwd_arrays, fwd_nb, fwd_nt, exact=exact)


def _spmm_fwd(x, fwd_arrays, bwd_arrays, fwd_nb, fwd_nt, bwd_nb, bwd_nt,
              exact):
    out = spmm_apply(x, *fwd_arrays, fwd_nb, fwd_nt, exact=exact)
    return out, (fwd_arrays, bwd_arrays)


def _spmm_bwd(fwd_nb, fwd_nt, bwd_nb, bwd_nt, exact, res, g):
    fwd_arrays, bwd_arrays = res
    dx = spmm_apply(g, *bwd_arrays, bwd_nb, bwd_nt, exact=exact)
    return dx, _float0s(fwd_arrays), _float0s(bwd_arrays)


spmm.defvjp(_spmm_fwd, _spmm_bwd)


def spmm_from_plans(x: jax.Array, fwd_plan: SpmmPlan, bwd_plan: SpmmPlan,
                    exact: bool = True) -> jax.Array:
    """Convenience wrapper for host-side SpmmPlan pairs (tests, benchmarks)."""
    *fa, fnb, fnt = _plan_args(fwd_plan)
    *ba, bnb, bnt = _plan_args(bwd_plan)
    return spmm(x, tuple(fa), tuple(ba), fnb, fnt, bnb, bnt, exact)


# ---------------------------------------------------------------------------
# Stacked per-interval plans for the model's lax.scan over intervals
# ---------------------------------------------------------------------------

def build_stacked_plans(u_src, u_tgt, i_src, i_tgt, num_users: int,
                        num_items: int, edge_counts) -> dict:
    """Build SpMM plans for every interval in both directions and stack them
    [g, ...] with a common chunk count per direction, for use under lax.scan.

    Inputs are the padded [g, E] arrays from data.graph.IntervalGraphs.
    Returns {'u': {...}, 'i': {...}, 'num_blocks_u', 'num_blocks_i'} where
    each direction dict holds stacked src/tgt_local/chunk_block/chunk_first.
    """
    g = u_src.shape[0]
    u_plans = [plan_spmm(u_src[k], u_tgt[k], num_users,
                         num_edges=int(edge_counts[k])) for k in range(g)]
    i_plans = [plan_spmm(i_src[k], i_tgt[k], num_items,
                         num_edges=int(edge_counts[k])) for k in range(g)]

    def stack(plans):
        nc = max(p.num_chunks for p in plans)
        plans = [p if p.num_chunks == nc else
                 plan_spmm_repad(p, nc) for p in plans]
        return {
            "src": np.stack([p.src for p in plans]),
            "tgt_local": np.stack([p.tgt_local for p in plans]),
            "chunk_block": np.stack([p.chunk_block for p in plans]),
            "chunk_first": np.stack([p.chunk_first for p in plans]),
        }

    return {
        "u": stack(u_plans), "i": stack(i_plans),
        "num_blocks_u": u_plans[0].num_blocks,
        "num_blocks_i": i_plans[0].num_blocks,
        "num_users": num_users, "num_items": num_items,
    }


def plan_spmm_repad(p: SpmmPlan, num_chunks: int) -> SpmmPlan:
    """Pad an existing plan with extra dump-block chunks."""
    extra = num_chunks - p.num_chunks
    assert extra >= 0
    cs = p.tgt_local.shape[-1]
    return SpmmPlan(
        src=np.concatenate([p.src, np.zeros(extra * cs, np.int32)]),
        tgt_local=np.concatenate(
            [p.tgt_local, np.full((extra, cs), R, np.int32)]),
        chunk_block=np.concatenate(
            [p.chunk_block, np.full(extra, p.num_blocks, np.int32)]),
        chunk_first=np.concatenate(
            [p.chunk_first, np.ones(extra, np.int32)]),
        num_blocks=p.num_blocks,
        num_tgt=p.num_tgt,
    )
