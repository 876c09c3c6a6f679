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

    Edge-id tracking (present when plan_spmm was called with track_edges;
    needed by the weighted SpMM / SDDMM kernels to move per-edge values
    between the caller's "canonical" edge order and the chunk layout):
    edge_slot:  [NC*C] int32 — canonical edge id per slot (pad: num_edge_ids)
    edge_pos:   [num_edge_ids] int32 — slot of each canonical edge in the
                flattened chunk stream (ids with no edge: NC*C, so a
                mode="fill" gather returns 0)
    num_edge_ids: length of the canonical id space (= the caller's padded
                edge array length; doubles as edge_slot's pad value)
    """

    src: np.ndarray
    tgt_local: np.ndarray
    chunk_block: np.ndarray
    chunk_first: np.ndarray
    num_blocks: int
    num_tgt: int
    edge_slot: np.ndarray | None = None
    edge_pos: np.ndarray | None = None
    num_edge_ids: int = 0

    @property
    def num_chunks(self) -> int:
        return self.tgt_local.shape[0]


def plan_spmm(src: np.ndarray, tgt: np.ndarray, num_tgt: int,
              num_edges: int | None = None,
              num_chunks: int | None = None,
              sort_sources: bool = True,
              chunk_size: int = C,
              num_slices: int = 1,
              edge_ids: np.ndarray | None = None,
              track_edges: bool = False) -> SpmmPlan:
    """Build the chunk schedule from target-sorted COO edges.

    `src`/`tgt` may carry padding at the end (tgt == num_tgt), which is
    dropped here; `num_edges` gives the true edge count if known.

    sort_sources: reorder edges WITHIN each target block by source id —
    edge order inside a block is free (the one-hot matmul sums regardless),
    and source-sorted chunks give the XLA gather near-sequential access
    patterns instead of fully random ones.

    track_edges / edge_ids: record where each edge landed in the chunk
    layout (SpmmPlan.edge_slot/edge_pos), so per-edge values (weights, SDDMM
    scores) can be gathered between orders on device. `edge_ids[e]` is the
    canonical id of input edge e (default: its input position); ids must be
    unique in [0, len(src)). The canonical id space is the INPUT padded edge
    array, shared by both directions of a graph when the transpose direction
    passes the cross-direction permutation as its edge_ids.
    """
    src = np.asarray(src, np.int32)
    tgt = np.asarray(tgt, np.int32)
    pad_id = len(src)
    if num_edges is None:
        num_edges = int(np.searchsorted(tgt, num_tgt))
    if edge_ids is not None:
        track_edges = True
        edge_ids = np.asarray(edge_ids, np.int32)[:num_edges]
    elif track_edges:
        edge_ids = np.arange(num_edges, dtype=np.int32)
    src, tgt = src[:num_edges], tgt[:num_edges]
    assert (np.diff(tgt) >= 0).all(), "edges must be sorted by target"

    # native C++ planner (byte-identical schedule, ~50-100x faster host
    # loop; ops/native_planner.py) — the Python path below stays as the
    # reference and fallback.
    from sagnn_tpu.ops import native_planner
    if num_edges >= 100_000 and native_planner.available():
        return _plan_spmm_native(src, tgt, edge_ids, num_edges, num_tgt,
                                 num_chunks, sort_sources, chunk_size,
                                 num_slices, track_edges, pad_id)

    if sort_sources and num_edges:
        order = np.lexsort((src, tgt // R))
        src, tgt = src[order], tgt[order]
        if track_edges:
            edge_ids = edge_ids[order]

    num_blocks = max(1, -(-num_tgt // R))
    blocks = tgt // R if num_edges else np.zeros(0, np.int32)
    # chunk boundaries: every C edges within a block. EVERY block gets at
    # least one chunk — empty blocks get an all-padding chunk whose
    # chunk_first=1 zeroes the output tile (otherwise it would be read back
    # uninitialized from VMEM).
    CS = chunk_size
    chunks_src, chunks_tl, chunk_block, chunk_first = [], [], [], []
    chunks_eid = []
    bounds = np.searchsorted(blocks, np.arange(num_blocks + 1))
    for b in range(num_blocks):
        start, end = int(bounds[b]), int(bounds[b + 1])
        if start == end:
            chunks_src.append(np.zeros(CS, np.int32))
            chunks_tl.append(np.full(CS, R, np.int32))
            chunks_eid.append(np.full(CS, pad_id, np.int32))
            chunk_block.append(b)
            chunk_first.append(1)
            continue
        for cs in range(start, end, CS):
            ce = min(cs + CS, end)
            s = np.zeros(CS, np.int32)
            tl = np.full(CS, R, np.int32)
            ei = np.full(CS, pad_id, np.int32)
            s[: ce - cs] = src[cs:ce]
            tl[: ce - cs] = tgt[cs:ce] - b * R
            if track_edges:
                ei[: ce - cs] = edge_ids[cs:ce]
            chunks_src.append(s)
            chunks_tl.append(tl)
            chunks_eid.append(ei)
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
        chunks_eid.append(np.full(CS, pad_id, np.int32))
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

    edge_slot = edge_pos = None
    if track_edges:
        edge_slot = np.concatenate(chunks_eid).astype(np.int32)
        # inverse map: canonical id -> flat slot; absent ids -> out-of-range
        # so a mode="fill" gather yields 0.
        edge_pos = np.full(pad_id, len(edge_slot), np.int32)
        real = edge_slot < pad_id
        edge_pos[edge_slot[real]] = np.nonzero(real)[0].astype(np.int32)

    return SpmmPlan(
        src=np.concatenate(chunks_src).astype(np.int32),
        tgt_local=np.stack(chunks_tl).astype(np.int32),
        chunk_block=np.asarray(chunk_block, np.int32),
        chunk_first=np.asarray(chunk_first, np.int32),
        num_blocks=num_blocks,
        num_tgt=num_tgt,
        edge_slot=edge_slot,
        edge_pos=edge_pos,
        num_edge_ids=pad_id,
    )


def _segsum_kernel(first_ref, blk_ref, tl_ref, *refs, exact: bool,
                   weighted: bool, zero_init: bool, folded: bool = False):
    """One chunk: out_block += one_hot(tgt_local)^T @ messages.

    exact=True forces 3-pass f32 MXU multiplication (the TPU MXU otherwise
    truncates f32 operands to bf16, which breaks segment-sum parity with the
    reference at ~1e-2).

    weighted=True folds per-edge weights into the transposed one-hot (the
    matmul then computes Σ w_e·x[src_e] at zero extra cost — no [C, D]
    pre-scale of the message stream).

    zero_init=True marks the aliased-zeros-input variant (sliced path):
    blocks a slice never visits keep the zeros of the aliased input.

    folded=True: messages arrive ROW-FOLDED [C, 2D] (two logical D-wide
    node rows per gathered row — the caller gathered src//2 from an
    [N/2, 2D] view, whose T(8,128) relayout copy carries ZERO lane
    padding at D=64 f32, vs 2.0x for [N, 64] rows); a parity operand
    selects each slot's half HERE, in VMEM, where it costs a VPU mux
    instead of the separate [E, 2D]-read/[E, D]-write HBM pass that made
    the XLA-level select 1.4x slower (scripts/probe_rowfold.py)."""
    del blk_ref  # consumed by the index maps
    if weighted:
        w_ref, refs = refs[0], refs[1:]
    if folded:
        par_ref, refs = refs[0], refs[1:]
    msg_ref = refs[0]
    out_ref = refs[-1]  # refs[-2] when zero_init is the aliased input
    del zero_init
    c = pl.program_id(0)
    first = first_ref[c]

    @pl.when(first == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tl = tl_ref[0]                                    # [1, C] int32
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, tl.shape[-1]), 0)
    hot = tl == rows                                  # [R, C] transposed 1-hot
    if weighted:
        oh_t = jnp.where(hot, w_ref[0], 0).astype(msg_ref.dtype)
    else:
        oh_t = hot.astype(msg_ref.dtype)
    msgs = msg_ref[:]
    if folded:
        d = out_ref.shape[-1]
        par = par_ref[0].reshape(-1, 1)               # [C, 1] int32
        msgs = jnp.where(par == 1, msgs[:, d:], msgs[:, :d])
    out_ref[:] += jax.lax.dot_general(
        oh_t, msgs,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if exact
                   else jax.lax.Precision.DEFAULT),
    ).astype(out_ref.dtype)


def _segsum_pallas(messages: jax.Array, tgt_local: jax.Array,
                   chunk_block: jax.Array, chunk_first: jax.Array,
                   num_blocks: int, exact: bool = True,
                   zero_init: bool = False,
                   weights: jax.Array | None = None,
                   parity: jax.Array | None = None,
                   vma: tuple | None = None) -> jax.Array:
    """messages: [NC*C, D] chunk-ordered; returns [(num_blocks+1)*R, D].

    zero_init=True aliases the output to a fresh zeros buffer so blocks this
    call never visits read back as zero (required by the sliced path, where
    a slice touches only a subset of blocks).

    weights: optional [NC*C] f32 per-edge weights in chunk order (weighted
    SpMM; pad slots must carry weight 0 or a pad tgt_local — both hold here).

    parity: optional [NC*C] int32 — ROW-FOLDED mode: messages are [NC*C, 2D]
    (gathered src//2 from an [N/2, 2D] table view) and each slot's D-wide
    half is selected in-kernel by parity (src & 1). Output stays [., D].

    vma: mesh axis names the output varies over — REQUIRED when calling
    from inside shard_map (check_vma demands explicit pallas out vma; the
    aliased zeros input is pcast to match).
    """
    nc = tgt_local.shape[0]
    cs = tgt_local.shape[-1]
    dm = messages.shape[-1]
    weighted = weights is not None
    folded = parity is not None
    d = dm // 2 if folded else dm
    tgt_local = tgt_local.reshape(nc, 1, cs)
    out_rows = (num_blocks + 1) * R
    in_specs = [
        pl.BlockSpec((1, 1, cs), lambda c, first, blk: (c, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [chunk_first, chunk_block, tgt_local]
    if weighted:
        in_specs.append(pl.BlockSpec((1, 1, cs),
                                     lambda c, first, blk: (c, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(weights.astype(jnp.float32).reshape(nc, 1, cs))
    if folded:
        in_specs.append(pl.BlockSpec((1, 1, cs),
                                     lambda c, first, blk: (c, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(parity.astype(jnp.int32).reshape(nc, 1, cs))
    in_specs.append(pl.BlockSpec((cs, dm), lambda c, first, blk: (c, 0),
                                 memory_space=pltpu.VMEM))
    inputs.append(messages)
    aliases = {}
    if zero_init:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        zeros = jnp.zeros((out_rows, d), jnp.float32)
        if vma:
            zeros = jax.lax.pcast(zeros, tuple(vma), to="varying")
        inputs.append(zeros)
        # zeros input (after 2 prefetch + tensor inputs) aliases the output
        aliases = {len(inputs) - 1: 0}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # chunk_first, chunk_block (used in maps)
        grid=(nc,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, d), lambda c, first, blk: (blk[c], 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, exact=exact, weighted=weighted,
                          zero_init=zero_init, folded=folded),
        grid_spec=grid_spec,
        # CPU (tests, CI meshes) runs the kernel in interpreter mode
        interpret=jax.default_backend() == "cpu",
        out_shape=jax.ShapeDtypeStruct(
            (out_rows, d), jnp.float32,
            **({"vma": frozenset(vma)} if vma else {})),
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=2 * nc * cs * R * d,
            bytes_accessed=nc * cs * (dm * 4 + 4)
            + (num_blocks + 1) * R * d * 4,
            transcendentals=0,
        ),
    )(*inputs)
    return out


def spmm_apply(x: jax.Array, src: jax.Array, tgt_local: jax.Array,
               chunk_block: jax.Array, chunk_first: jax.Array,
               num_blocks: int, num_tgt: int,
               exact: bool = True, num_slices: int = 1,
               weights: jax.Array | None = None,
               folded: bool = False) -> jax.Array:
    """out[t] = Σ_{e: tgt[e]=t} w[e]·x[src[e]] — XLA gather + Pallas segsum.

    exact=False is the throughput path: the node table is cast to bf16
    BEFORE the gather, halving the dominant random-read+stream traffic of
    the [E, D] message stream; accumulation stays f32 in the kernel.

    weights: optional [NC*C] f32 chunk-ordered edge weights (w ≡ 1 without);
    they ride the one-hot operand, so the weighted SpMM costs the same as
    the unweighted one.

    folded=True (exact/unweighted, even row count): gather from the
    [N/2, 2D] row-folded view of x — its feature-minor relayout copy has
    ZERO lane padding at D=64 f32 (the plain [N, 64] copy pads 2.0x; the
    half-select happens in-kernel, see _segsum_kernel). Silently ignored
    when the preconditions don't hold, so callers can pass the config
    flag unconditionally.

    num_slices>1 is the out-of-core path for huge graphs: only one slice's
    message stream is live at a time (a lax.scan over slices sums partial
    outputs). The plan MUST have been built with the same num_slices so
    slice-leading chunks re-zero their blocks.
    """
    # folding composes with BOTH precisions (bf16 rows fold 128 B -> 256 B;
    # the relayout copy of bf16 [N, 64] lane-pads 2x just like f32)
    fold = (folded and weights is None and x.shape[0] % 2 == 0)
    if not exact:
        x = x.astype(jnp.bfloat16)
    d = x.shape[-1]
    if fold:
        xf = x.reshape(x.shape[0] // 2, 2 * d)
    if num_slices == 1:
        if fold:
            messages = jnp.take(xf, src // 2, axis=0)    # [NC*C, 2D]
            out = _segsum_pallas(messages, tgt_local, chunk_block,
                                 chunk_first, num_blocks, exact=exact,
                                 parity=src & 1)
        else:
            messages = jnp.take(x, src, axis=0)  # [NC*C, D], bandwidth-bound
            out = _segsum_pallas(messages, tgt_local, chunk_block,
                                 chunk_first, num_blocks, exact=exact,
                                 weights=weights)
        return out[:num_tgt]

    nc = tgt_local.shape[0]
    cs = tgt_local.shape[-1]
    assert nc % num_slices == 0, (nc, num_slices)
    per = nc // num_slices
    xs = (src.reshape(num_slices, per * cs),
          tgt_local.reshape(num_slices, per, cs),
          chunk_block.reshape(num_slices, per),
          chunk_first.reshape(num_slices, per),
          (jnp.zeros((num_slices, 0)) if weights is None
           else weights.reshape(num_slices, per * cs)))

    def body(acc, sl):
        s, tl, cb, cf, w = sl
        if fold:
            messages = jnp.take(xf, s // 2, axis=0)
            out = _segsum_pallas(messages, tl, cb, cf, num_blocks,
                                 exact=exact, zero_init=True, parity=s & 1)
        else:
            messages = jnp.take(x, s, axis=0)
            out = _segsum_pallas(messages, tl, cb, cf, num_blocks,
                                 exact=exact, zero_init=True,
                                 weights=None if weights is None else w)
        return acc + out, None

    init = jnp.zeros(((num_blocks + 1) * R, d), jnp.float32)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def spmm(x: jax.Array, fwd_arrays: Tuple, bwd_arrays: Tuple,
         fwd_nb: int, fwd_nt: int, bwd_nb: int, bwd_nt: int,
         exact: bool = True, folded: bool = False) -> jax.Array:
    """Differentiable A @ x for the fixed sparse A.

    fwd_arrays/bwd_arrays: (src, tgt_local, chunk_block, chunk_first) device
    arrays for A (target-sorted) and A^T (source-sorted) — TRACED args, so
    this composes with lax.scan over stacked per-interval plans; the static
    block/target counts ride nondiff_argnums.

    folded=True enables the row-folded gather (spmm_apply) in BOTH
    directions — the backward gathers from the cotangent table, which
    carries the same 2x lane-padded relayout copy.
    """
    return spmm_apply(x, *fwd_arrays, fwd_nb, fwd_nt, exact=exact,
                      folded=folded)


def _spmm_fwd(x, fwd_arrays, bwd_arrays, fwd_nb, fwd_nt, bwd_nb, bwd_nt,
              exact, folded):
    out = spmm_apply(x, *fwd_arrays, fwd_nb, fwd_nt, exact=exact,
                     folded=folded)
    return out, (fwd_arrays, bwd_arrays)


def _spmm_bwd(fwd_nb, fwd_nt, bwd_nb, bwd_nt, exact, folded, res, g):
    fwd_arrays, bwd_arrays = res
    dx = spmm_apply(g, *bwd_arrays, bwd_nb, bwd_nt, exact=exact,
                    folded=folded)
    return dx, _float0s(fwd_arrays), _float0s(bwd_arrays)


spmm.defvjp(_spmm_fwd, _spmm_bwd)


def spmm_from_plans(x: jax.Array, fwd_plan: SpmmPlan, bwd_plan: SpmmPlan,
                    exact: bool = True) -> jax.Array:
    """Convenience wrapper for host-side SpmmPlan pairs (tests, benchmarks)."""
    *fa, fnb, fnt = _plan_args(fwd_plan)
    *ba, bnb, bnt = _plan_args(bwd_plan)
    return spmm(x, tuple(fa), tuple(ba), fnb, fnt, bnb, bnt, exact)


# ---------------------------------------------------------------------------
# Source-SHARDED SpMM for huge node tables
#
# XLA's row-gather drops ~4.2x once the source operand exceeds the VMEM-
# stageable size (measured on this chip: ~388 Mrows/s at ≤32 MB operands vs
# ~90 Mrows/s at ≥64 MB, INDEPENDENT of the hot-set size — the gather
# emitter switches strategy on operand size; there is no cache to exploit,
# and popularity renumbering does nothing). Partitioning the EDGES by
# source shard lets every gather read from a dynamic_slice of the table
# that stays on the fast path; per-shard partial outputs accumulate over a
# lax.scan exactly like the out-of-core sliced path (zero_init aliasing —
# blocks a shard never touches stay zero, so empty (block, shard) pairs
# emit NO chunks at all).
# ---------------------------------------------------------------------------

def _strip_empty_chunks(p: SpmmPlan) -> SpmmPlan:
    """Drop all-padding chunks (empty blocks + tail pad) — valid only for
    zero_init consumers, which keep unvisited blocks zero."""
    keep = (p.tgt_local < R).any(axis=1)
    if bool(keep.all()):
        return p
    cs = p.tgt_local.shape[-1]
    return SpmmPlan(
        src=p.src.reshape(-1, cs)[keep].reshape(-1),
        tgt_local=p.tgt_local[keep],
        chunk_block=p.chunk_block[keep],
        chunk_first=p.chunk_first[keep],
        num_blocks=p.num_blocks, num_tgt=p.num_tgt)


def plan_spmm_src_sharded(src, tgt, num_tgt: int, num_src: int,
                          shard_rows: int, num_edges: int | None = None,
                          chunk_size: int = 0) -> dict:
    """Build per-source-shard schedules, padded to a common chunk count.

    Returns stacked [S, ...] plan arrays with shard-LOCAL source ids plus
    the static counts spmm_apply_src_sharded needs. chunk_size=0
    auto-selects with the choose_chunk_size cost model over the
    (shard, block) fill histogram (executed cost: S * max-shard chunks).
    """
    src = np.asarray(src, np.int32)
    tgt = np.asarray(tgt, np.int32)
    if num_edges is None:
        num_edges = int(np.searchsorted(tgt, num_tgt))
    src, tgt = src[:num_edges], tgt[:num_edges]
    S = max(1, -(-num_src // shard_rows))
    sid = src // shard_rows
    num_blocks = max(1, -(-num_tgt // R))
    if chunk_size == 0:
        hists = [np.bincount(tgt[sid == s] // R, minlength=num_blocks)
                 for s in range(S)]
        best, best_cost = 1024, None
        for cs_ in (256, 512, 1024, 2048):
            nc_max = max(
                (int(np.where(h > 0, -(-h // cs_), 0).sum()) for h in hists),
                default=1) or 1
            cost = S * nc_max * (cs_ + 56.0)
            if best_cost is None or cost < best_cost:
                best, best_cost = cs_, cost
        chunk_size = best
    plans = []
    for s in range(S):
        m = sid == s
        p = plan_spmm(src[m] - s * shard_rows, tgt[m], num_tgt,
                      num_edges=int(m.sum()), chunk_size=chunk_size)
        plans.append(_strip_empty_chunks(p))
    nc = max(max(p.num_chunks for p in plans), 1)
    plans = [p if p.num_chunks == nc else plan_spmm_repad(p, nc)
             for p in plans]
    return {
        "src": np.stack([p.src for p in plans]),
        "tgt_local": np.stack([p.tgt_local for p in plans]),
        "chunk_block": np.stack([p.chunk_block for p in plans]),
        "chunk_first": np.stack([p.chunk_first for p in plans]),
        "num_blocks": num_blocks, "num_tgt": num_tgt,
        "shard_rows": shard_rows, "num_shards": S,
    }


def spmm_apply_src_sharded(x: jax.Array, src: jax.Array,
                           tgt_local: jax.Array, chunk_block: jax.Array,
                           chunk_first: jax.Array, num_blocks: int,
                           num_tgt: int, shard_rows: int,
                           exact: bool = True,
                           shard_idx: jax.Array | None = None,
                           folded: bool = False) -> jax.Array:
    """out[t] = Σ_e x[src[e]] via per-source-shard fast-path gathers.

    x: [num_src, D]; stacked [S', ...] arrays from plan_spmm_src_sharded.
    One slice's messages are live at a time (doubles as out-of-core).

    shard_idx: optional [S'] int32 source-shard id per slice row — lets a
    shard's chunk stream be SUB-SLICED into several scan steps (any chunk
    boundary is a correct split under zero_init accumulation), bounding the
    live [slots, D] message buffer on huge graphs. Default: row i gathers
    from shard i (one slice per shard).

    folded=True (exact mode): the table is reshaped ONCE to [N/2, 2D]
    (zero-lane-pad relayout — the 1M-scale exact-mode memory lever, see
    spmm_apply) and each shard windows into it with halved offsets;
    shard-local src ids fold inside the window (shard_rows is even: all
    shard sizes are 128-multiples)."""
    S = tgt_local.shape[0]
    d = x.shape[-1]
    n_shards = S if shard_idx is None \
        else -(-x.shape[0] // shard_rows)
    pad = n_shards * shard_rows - x.shape[0]
    if pad > 0:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    fold = folded and shard_rows % 2 == 0
    if not exact:
        x = x.astype(jnp.bfloat16)
    if fold:
        x = x.reshape(x.shape[0] // 2, 2 * d)
    if shard_idx is None:
        shard_idx = jnp.arange(S, dtype=jnp.int32)

    def body(acc, sl):
        s_idx, s_src, tl, cb, cf = sl
        if fold:
            xs = jax.lax.dynamic_slice_in_dim(
                x, s_idx * (shard_rows // 2), shard_rows // 2, 0)
            messages = jnp.take(xs, s_src // 2, axis=0)
            out = _segsum_pallas(messages, tl, cb, cf, num_blocks,
                                 exact=exact, zero_init=True,
                                 parity=s_src & 1)
        else:
            xs = jax.lax.dynamic_slice_in_dim(x, s_idx * shard_rows,
                                              shard_rows, 0)
            messages = jnp.take(xs, s_src, axis=0)
            out = _segsum_pallas(messages, tl, cb, cf, num_blocks,
                                 exact=exact, zero_init=True)
        return acc + out, None

    acc0 = jnp.zeros(((num_blocks + 1) * R, d), jnp.float32)
    out, _ = jax.lax.scan(
        body, acc0, (shard_idx, src, tgt_local, chunk_block, chunk_first))
    return out[:num_tgt]


def _sharded_args(p: dict):
    return ((jnp.asarray(p["src"]), jnp.asarray(p["tgt_local"]),
             jnp.asarray(p["chunk_block"]), jnp.asarray(p["chunk_first"])),
            int(p["num_blocks"]), int(p["num_tgt"]), int(p["shard_rows"]))


def _ss_apply(x, arrays, nb, nt, sr, exact, folded=False):
    """arrays: (src, tgt_local, chunk_block, chunk_first[, shard_idx])."""
    sidx = arrays[4] if len(arrays) == 5 else None
    return spmm_apply_src_sharded(x, arrays[0], arrays[1], arrays[2],
                                  arrays[3], nb, nt, sr, exact=exact,
                                  shard_idx=sidx, folded=folded)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11))
def spmm_src_sharded(x: jax.Array, fwd_arrays: Tuple, bwd_arrays: Tuple,
                     fwd_nb: int, fwd_nt: int, fwd_sr: int,
                     bwd_nb: int, bwd_nt: int, bwd_sr: int,
                     num_src: int, exact: bool = True,
                     folded: bool = False) -> jax.Array:
    """Differentiable source-sharded A @ x; backward is the transpose
    direction's sharded plan (bwd shards partition the TARGET space of the
    forward). num_src: x's true row count (the bwd output is sliced to it).
    Array tuples may carry a 5th shard_idx element (sub-sliced streams,
    see spmm_apply_src_sharded). folded: row-folded gathers both ways.
    """
    return _ss_apply(x, fwd_arrays, fwd_nb, fwd_nt, fwd_sr, exact, folded)


def _spmm_ss_fwd(x, fwd_arrays, bwd_arrays, fwd_nb, fwd_nt, fwd_sr,
                 bwd_nb, bwd_nt, bwd_sr, num_src, exact, folded):
    out = _ss_apply(x, fwd_arrays, fwd_nb, fwd_nt, fwd_sr, exact, folded)
    return out, (fwd_arrays, bwd_arrays)


def _spmm_ss_bwd(fwd_nb, fwd_nt, fwd_sr, bwd_nb, bwd_nt, bwd_sr, num_src,
                 exact, folded, res, g):
    fwd_arrays, bwd_arrays = res
    dx = _ss_apply(g, bwd_arrays, bwd_nb, bwd_nt, bwd_sr, exact, folded)
    return dx[:num_src], _float0s(fwd_arrays), _float0s(bwd_arrays)


spmm_src_sharded.defvjp(_spmm_ss_fwd, _spmm_ss_bwd)


# ---------------------------------------------------------------------------
# SDDMM + weighted SpMM (mutually dual — each is the other's gradient)
#
# SDDMM (sampled dense-dense matmul): s_e = x[src_e] · y[tgt_e] for every
# edge. The reference never needs it (propagation is unweighted, SURVEY.md
# Q1/Q2), but it is the kernel behind every edge-scored variant (normalized /
# GAT-style propagation) and the exact gradient of the weighted SpMM:
#     out = Σ_e w_e·x[src_e]        ⇒  ∂w_e = x[src_e]·ḡ[tgt_e]   (SDDMM)
#     s_e = x[src_e]·y[tgt_e]       ⇒  ∂y   = Σ_e s̄_e·x[src_e]   (wSpMM)
#
# TPU shape: the target-side gather that a naive SDDMM would do (y[tgt], a
# second [E, D] random read) is replaced by MXU work on the block already
# resident in VMEM — one_hot(tgt_local)[C, R] @ y_block[R, D] — so only the
# source gather touches HBM randomly, same as the unweighted SpMM.
# ---------------------------------------------------------------------------

def _sddmm_kernel(blk_ref, tl_ref, msg_ref, y_ref, out_ref, *, exact: bool):
    """One chunk: scores[C] = Σ_d msgs[C, D] ⊙ (one_hot(tl)[C, R] @ y[R, D]).

    The output block is [8, C] spanning 8 consecutive chunks (Mosaic
    requires output sublanes divisible by 8); each grid step writes only its
    own row via select, and the block flushes after its 8th revisit."""
    del blk_ref  # consumed by the index maps
    tl = tl_ref[0]                                    # [1, C] int32
    cols = jax.lax.broadcasted_iota(jnp.int32, (tl.shape[-1], R), 1)
    oh = (tl.reshape(-1, 1) == cols).astype(y_ref.dtype)       # [C, R]
    gathered = jax.lax.dot_general(                   # [C, D] target embeds
        oh, y_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if exact
                   else jax.lax.Precision.DEFAULT),
    )
    prod = gathered * msg_ref[:].astype(jnp.float32)
    val = jnp.sum(prod, axis=-1)                      # [C]
    r = pl.program_id(0) % 8
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, val.shape[0]), 0)
    out_ref[:] = jnp.where(rows == r, val[None, :], out_ref[:])


def sddmm_apply(x: jax.Array, y: jax.Array, src: jax.Array,
                tgt_local: jax.Array, chunk_block: jax.Array,
                num_blocks: int, num_tgt: int,
                exact: bool = True) -> jax.Array:
    """Edge scores in CHUNK order: flat [NC*C] f32, pad slots = 0.

    Gather back to canonical edge order with the plan's edge_pos
    (`jnp.take(out, edge_pos, mode="fill", fill_value=0.0)`).
    """
    if not exact:
        x = x.astype(jnp.bfloat16)
        y = y.astype(jnp.bfloat16)
    nc = tgt_local.shape[0]
    cs = tgt_local.shape[-1]
    d = x.shape[-1]
    messages = jnp.take(x, src, axis=0)               # [NC*C, D]
    rows = (num_blocks + 1) * R
    y_pad = jnp.pad(y, ((0, rows - y.shape[0]), (0, 0)))
    # pad the grid to a multiple of 8 chunks: the output writes in [8, C]
    # blocks (Mosaic sublane divisibility); pad chunks score 0 rows
    nc8 = -(-nc // 8) * 8
    if nc8 != nc:
        pad = nc8 - nc
        tgt_local = jnp.concatenate(
            [tgt_local, jnp.full((pad,) + tgt_local.shape[1:], R,
                                 tgt_local.dtype)])
        chunk_block = jnp.concatenate(
            [chunk_block, jnp.full((pad,), num_blocks, chunk_block.dtype)])
        messages = jnp.concatenate(
            [messages, jnp.zeros((pad * cs, d), messages.dtype)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,    # chunk_block (used in the y index map)
        grid=(nc8,),
        in_specs=[
            pl.BlockSpec((1, 1, cs), lambda c, blk: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cs, d), lambda c, blk: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, d), lambda c, blk: (blk[c], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, cs), lambda c, blk: (c // 8, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_sddmm_kernel, exact=exact),
        grid_spec=grid_spec,
        interpret=jax.default_backend() == "cpu",
        out_shape=jax.ShapeDtypeStruct((nc8, cs), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nc8 * cs * R * d + nc8 * cs * d,
            bytes_accessed=nc8 * cs * (d * 4 + 4) + rows * d * 4,
            transcendentals=0,
        ),
    )(chunk_block, tgt_local.reshape(nc8, 1, cs), messages, y_pad)
    return out[:nc].reshape(-1)


def _chunk_weights(w: jax.Array, edge_slot: jax.Array) -> jax.Array:
    """Canonical-order edge values -> chunk-order flat [NC*C] (pad -> 0).

    edge_slot's pad value is num_edge_ids == len(w), hitting the appended 0.
    """
    w_safe = jnp.concatenate([w.astype(jnp.float32),
                              jnp.zeros((1,), jnp.float32)])
    return jnp.take(w_safe, edge_slot)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def spmm_weighted(x: jax.Array, w: jax.Array, fwd_arrays: Tuple,
                  bwd_arrays: Tuple, fwd_nb: int, fwd_nt: int,
                  bwd_nb: int, bwd_nt: int,
                  exact: bool = True) -> jax.Array:
    """Differentiable A_w @ x — weighted SpMM over a fixed sparse pattern.

    fwd_arrays/bwd_arrays: (src, tgt_local, chunk_block, chunk_first,
    edge_slot, edge_pos) device arrays from edge-tracked plans of A and A^T.
    Both plans' edge ids must refer to the SAME canonical order as `w`
    (len(w) == num_edge_ids). Differentiable in BOTH x and w.
    """
    s, tl, cb, cf, eslot, _ = fwd_arrays
    return spmm_apply(x, s, tl, cb, cf, fwd_nb, fwd_nt, exact=exact,
                      weights=_chunk_weights(w, eslot))


def _spmm_weighted_fwd(x, w, fwd_arrays, bwd_arrays, fwd_nb, fwd_nt,
                       bwd_nb, bwd_nt, exact):
    out = spmm_weighted(x, w, fwd_arrays, bwd_arrays, fwd_nb, fwd_nt,
                        bwd_nb, bwd_nt, exact)
    return out, (x, w, fwd_arrays, bwd_arrays)


def _spmm_weighted_bwd(fwd_nb, fwd_nt, bwd_nb, bwd_nt, exact, res, g):
    x, w, fwd_arrays, bwd_arrays = res
    bs, btl, bcb, bcf, beslot, _ = bwd_arrays
    dx = spmm_apply(g, bs, btl, bcb, bcf, bwd_nb, bwd_nt, exact=exact,
                    weights=_chunk_weights(w, beslot))
    fs, ftl, fcb, _fcf, _feslot, fepos = fwd_arrays
    flat = sddmm_apply(x, g, fs, ftl, fcb, fwd_nb, fwd_nt, exact=exact)
    dw = jnp.take(flat, fepos, mode="fill", fill_value=0.0)
    return dx, dw, _float0s(fwd_arrays), _float0s(bwd_arrays)


spmm_weighted.defvjp(_spmm_weighted_fwd, _spmm_weighted_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def sddmm(x: jax.Array, y: jax.Array, fwd_arrays: Tuple, bwd_arrays: Tuple,
          fwd_nb: int, fwd_nt: int, bwd_nb: int, bwd_nt: int,
          exact: bool = True) -> jax.Array:
    """Differentiable per-edge scores s_e = x[src_e]·y[tgt_e], in canonical
    edge order [num_edge_ids] (absent/padding ids score 0).

    Plan requirements identical to spmm_weighted.
    """
    s, tl, cb, _cf, _eslot, epos = fwd_arrays
    flat = sddmm_apply(x, y, s, tl, cb, fwd_nb, fwd_nt, exact=exact)
    return jnp.take(flat, epos, mode="fill", fill_value=0.0)


def _sddmm_fwd(x, y, fwd_arrays, bwd_arrays, fwd_nb, fwd_nt, bwd_nb, bwd_nt,
               exact):
    out = sddmm(x, y, fwd_arrays, bwd_arrays, fwd_nb, fwd_nt, bwd_nb,
                bwd_nt, exact)
    return out, (x, y, fwd_arrays, bwd_arrays)


def _sddmm_bwd(fwd_nb, fwd_nt, bwd_nb, bwd_nt, exact, res, g):
    x, y, fwd_arrays, bwd_arrays = res
    fs, ftl, fcb, fcf, feslot, _ = fwd_arrays
    bs, btl, bcb, bcf, beslot, _ = bwd_arrays
    # ∂y[t] = Σ_{e: tgt_e = t} ḡ_e x[src_e] — weighted SpMM, fwd direction
    dy = spmm_apply(x, fs, ftl, fcb, fcf, fwd_nb, fwd_nt, exact=exact,
                    weights=_chunk_weights(g, feslot))
    # ∂x[u] = Σ_{e: src_e = u} ḡ_e y[tgt_e] — weighted SpMM, transpose dir
    dx = spmm_apply(y, bs, btl, bcb, bcf, bwd_nb, bwd_nt, exact=exact,
                    weights=_chunk_weights(g, beslot))
    return dx, dy, _float0s(fwd_arrays), _float0s(bwd_arrays)


sddmm.defvjp(_sddmm_fwd, _sddmm_bwd)


def _plan_args_tracked(p: SpmmPlan):
    assert p.edge_slot is not None, "plan built without track_edges"
    return ((jnp.asarray(p.src), jnp.asarray(p.tgt_local),
             jnp.asarray(p.chunk_block), jnp.asarray(p.chunk_first),
             jnp.asarray(p.edge_slot), jnp.asarray(p.edge_pos)),
            p.num_blocks, p.num_tgt)


def spmm_weighted_from_plans(x: jax.Array, w: jax.Array, fwd_plan: SpmmPlan,
                             bwd_plan: SpmmPlan,
                             exact: bool = True) -> jax.Array:
    fa, fnb, fnt = _plan_args_tracked(fwd_plan)
    ba, bnb, bnt = _plan_args_tracked(bwd_plan)
    return spmm_weighted(x, w, fa, ba, fnb, fnt, bnb, bnt, exact)


def sddmm_from_plans(x: jax.Array, y: jax.Array, fwd_plan: SpmmPlan,
                     bwd_plan: SpmmPlan, exact: bool = True) -> jax.Array:
    fa, fnb, fnt = _plan_args_tracked(fwd_plan)
    ba, bnb, bnt = _plan_args_tracked(bwd_plan)
    return sddmm(x, y, fa, ba, fnb, fnt, bnb, bnt, exact)


# ---------------------------------------------------------------------------
# Stacked per-interval plans for the model's lax.scan over intervals
# ---------------------------------------------------------------------------

def choose_chunk_size(tgt_stacked, edge_counts, num_tgt: int,
                      candidates=(256, 512, 1024, 2048)) -> int:
    """Pick the chunk size minimizing predicted SpMM cost for one direction.

    Slots (real + padding) cost ~1 unit each (gather row + MXU column +
    message stream); each chunk carries a fixed grid-step overhead worth
    ~56 slots (calibrated on-chip: at gowalla scale, 0.5M-edge intervals,
    CS 1024/512/256 measured 66.5/57.9/57.1 ms propagation — the 512->256
    marginal trade of 47k slots for 968 chunks was a wash). High-fill
    graphs (the 4M-edge bench) keep CS=1024; low-fill ones (few edges per
    128-row target block) drop to 512/256 instead of padding every block's
    tail chunk to 1024.
    """
    CHUNK_OVERHEAD = 56.0
    g = tgt_stacked.shape[0]
    num_blocks = max(1, -(-num_tgt // R))
    hists = []
    for k in range(g):
        ne = int(edge_counts[k])
        hists.append(np.bincount(
            np.asarray(tgt_stacked[k][:ne]) // R, minlength=num_blocks))
    best_cs, best_cost = candidates[0], None
    for cs in candidates:
        # build_stacked_plans pads every interval to the LARGEST interval's
        # chunk count, so the executed cost is g * max_k(chunks_k) — the
        # max, not the sum (with skewed intervals the sum picks a chunk
        # size that is worse under its own constants)
        nc_max = max(
            int(np.maximum(1, -(-h // cs)).sum())  # empty block: 1 pad chunk
            for h in hists)
        cost = g * nc_max * (cs + CHUNK_OVERHEAD)
        if best_cost is None or cost < best_cost:
            best_cs, best_cost = cs, cost
    return best_cs


def build_stacked_plans(u_src, u_tgt, i_src, i_tgt, num_users: int,
                        num_items: int, edge_counts,
                        track_edges: bool = False,
                        i_edge_ids=None,
                        chunk_size: int = 0) -> dict:
    """Build SpMM plans for every interval in both directions and stack them
    [g, ...] with a common chunk count per direction, for use under lax.scan.

    Inputs are the padded [g, E] arrays from data.graph.IntervalGraphs.
    Returns {'u': {...}, 'i': {...}, 'num_blocks_u', 'num_blocks_i'} where
    each direction dict holds stacked src/tgt_local/chunk_block/chunk_first.

    track_edges: also stack edge_slot/edge_pos for the weighted/SDDMM ops.
    The canonical per-interval edge order is the U-DIRECTION padded edge
    array ([g, E], matching data.graph.edge_weights(...)[0]); `i_edge_ids`
    ([g, E], from data.graph.direction_permutation) maps each i-direction
    edge to its u-direction position so both plans share that order.
    """
    g = u_src.shape[0]
    if track_edges and i_edge_ids is None:
        raise ValueError("track_edges needs i_edge_ids (the i->u direction "
                         "permutation) so both plans share one edge order")
    # chunk_size=0: auto-select per direction from the block-fill histogram
    # (all intervals of a direction share one stacked plan shape, so the
    # choice is per-direction, not per-interval)
    u_cs = chunk_size or choose_chunk_size(u_tgt, edge_counts, num_users)
    i_cs = chunk_size or choose_chunk_size(i_tgt, edge_counts, num_items)
    u_plans = [plan_spmm(u_src[k], u_tgt[k], num_users,
                         num_edges=int(edge_counts[k]),
                         chunk_size=u_cs,
                         track_edges=track_edges) for k in range(g)]
    i_plans = [plan_spmm(i_src[k], i_tgt[k], num_items,
                         num_edges=int(edge_counts[k]),
                         chunk_size=i_cs,
                         edge_ids=(i_edge_ids[k] if track_edges else None))
               for k in range(g)]

    def stack(plans):
        # round the common chunk count to a multiple of 8: sddmm_apply's
        # grid writes [8, C] output blocks (Mosaic sublane divisibility),
        # and padding here (≤7 benign chunks) avoids its runtime fallback
        # that concatenates zero rows onto the full [NC*C, D] message stream
        nc = -(-max(p.num_chunks for p in plans) // 8) * 8
        plans = [p if p.num_chunks == nc else
                 plan_spmm_repad(p, nc) for p in plans]
        out = {
            "src": np.stack([p.src for p in plans]),
            "tgt_local": np.stack([p.tgt_local for p in plans]),
            "chunk_block": np.stack([p.chunk_block for p in plans]),
            "chunk_first": np.stack([p.chunk_first for p in plans]),
        }
        if track_edges:
            out["edge_slot"] = np.stack([p.edge_slot for p in plans])
            out["edge_pos"] = np.stack([p.edge_pos for p in plans])
        return out

    return {
        "u": stack(u_plans), "i": stack(i_plans),
        "num_blocks_u": u_plans[0].num_blocks,
        "num_blocks_i": i_plans[0].num_blocks,
        "num_users": num_users, "num_items": num_items,
    }


def _repad_ss(p: dict, nc: int) -> dict:
    """Pad a plan_spmm_src_sharded dict's per-shard chunk count to `nc`
    with dump-block chunks (same convention as plan_spmm_repad; the sharded
    consumer runs zero_init, so dump chunks are pure no-ops)."""
    S, old = p["chunk_block"].shape
    extra = nc - old
    assert extra >= 0, (nc, old)
    if extra == 0:
        return p
    cs = p["tgt_local"].shape[-1]
    nb = p["num_blocks"]
    out = dict(p)
    out["src"] = np.concatenate(
        [p["src"], np.zeros((S, extra * cs), np.int32)], axis=1)
    out["tgt_local"] = np.concatenate(
        [p["tgt_local"], np.full((S, extra, cs), R, np.int32)], axis=1)
    out["chunk_block"] = np.concatenate(
        [p["chunk_block"], np.full((S, extra), nb, np.int32)], axis=1)
    out["chunk_first"] = np.concatenate(
        [p["chunk_first"], np.ones((S, extra), np.int32)], axis=1)
    return out


# largest chunk-stream slice (slots) live at once in the src-sharded scan:
# 2^20 gathered rows = 256 MB of f32 messages at D=64 — keeps the dominant
# temp bounded regardless of graph size or shard imbalance
MAX_SLICE_SLOTS = 2 ** 20


def _subslice_stacked(d: dict, num_blocks: int, max_slots: int) -> dict:
    """Split each source shard's chunk stream into K scan slices of at most
    `max_slots` slots ([g, S, ...] -> [g, S*K, ...] + shard_idx). Any chunk
    boundary is a correct split under zero_init accumulation (each slice
    partial-sums into the carried accumulator)."""
    g, S, nc = d["chunk_block"].shape
    cs = d["tgt_local"].shape[-1]
    K = max(1, -(-(nc * cs) // max_slots))
    if K == 1:
        d = dict(d)
        d["shard_idx"] = np.tile(np.arange(S, dtype=np.int32), (g, 1))
        return d
    nc2 = -(-nc // K)
    extra = K * nc2 - nc
    src = d["src"].reshape(g, S, nc, cs)
    src = np.concatenate(
        [src, np.zeros((g, S, extra, cs), np.int32)], axis=2)
    tl = np.concatenate(
        [d["tgt_local"], np.full((g, S, extra, cs), R, np.int32)], axis=2)
    cb = np.concatenate(
        [d["chunk_block"], np.full((g, S, extra), num_blocks, np.int32)],
        axis=2)
    cf = np.concatenate(
        [d["chunk_first"], np.ones((g, S, extra), np.int32)], axis=2)
    return {
        "src": src.reshape(g, S * K, nc2 * cs),
        "tgt_local": tl.reshape(g, S * K, nc2, cs),
        "chunk_block": cb.reshape(g, S * K, nc2),
        "chunk_first": cf.reshape(g, S * K, nc2),
        "shard_idx": np.tile(
            np.repeat(np.arange(S, dtype=np.int32), K), (g, 1)),
    }


def build_stacked_plans_src_sharded(u_src, u_tgt, i_src, i_tgt,
                                    num_users: int, num_items: int,
                                    edge_counts, shard_rows: int,
                                    chunk_size: int = 0,
                                    max_slice_slots: int = MAX_SLICE_SLOTS
                                    ) -> dict:
    """Source-sharded plans for every interval, both directions, stacked
    [g, S, ...] with a common shard + chunk count per direction — the
    lax.scan-ready analog of build_stacked_plans for huge node tables
    (beyond XLA's ~32 MB gather-operand cliff; see plan_spmm_src_sharded).

    shard_rows applies to BOTH source tables (u-direction gathers from the
    item table, i-direction from the user table); the per-direction shard
    counts differ (S = ceil(num_src / shard_rows)) but one static row count
    keeps the model's hop signature to a single config value.
    """
    g = u_src.shape[0]

    def build(direction_src, direction_tgt, num_tgt, num_src):
        cs = chunk_size
        plans = []
        for k in range(g):
            p = plan_spmm_src_sharded(direction_src[k], direction_tgt[k],
                                      num_tgt, num_src, shard_rows,
                                      num_edges=int(edge_counts[k]),
                                      chunk_size=cs)
            # one chunk size per direction (interval 0's auto-choice),
            # so the stacked arrays share a last-axis width
            cs = p["tgt_local"].shape[-1]
            plans.append(p)
        nc = max(p["chunk_block"].shape[1] for p in plans)
        plans = [_repad_ss(p, nc) for p in plans]
        return {
            "src": np.stack([p["src"] for p in plans]),
            "tgt_local": np.stack([p["tgt_local"] for p in plans]),
            "chunk_block": np.stack([p["chunk_block"] for p in plans]),
            "chunk_first": np.stack([p["chunk_first"] for p in plans]),
        }

    nb_u = max(1, -(-num_users // R))
    nb_i = max(1, -(-num_items // R))
    return {
        "u": _subslice_stacked(build(u_src, u_tgt, num_users, num_items),
                               nb_u, max_slice_slots),
        "i": _subslice_stacked(build(i_src, i_tgt, num_items, num_users),
                               nb_i, max_slice_slots),
        "num_blocks_u": nb_u,
        "num_blocks_i": nb_i,
        "shard_rows": shard_rows,
        "num_users": num_users, "num_items": num_items,
    }


def _plan_spmm_native(src, tgt, edge_ids, num_edges, num_tgt, num_chunks,
                      sort_sources, chunk_size, num_slices, track_edges,
                      pad_id) -> SpmmPlan:
    """plan_spmm's hot loop via native/planner.cc (see plan_spmm)."""
    from sagnn_tpu.ops import native_planner
    CS = chunk_size
    num_blocks = max(1, -(-num_tgt // R))
    nc = native_planner.native_count(tgt, num_edges, num_tgt, R, CS)
    target_nc = num_chunks or max(1, nc)
    assert nc <= target_nc, f"plan needs {nc} chunks > padded {target_nc}"
    if num_slices > 1:
        target_nc = -(-target_nc // num_slices) * num_slices
    out_src, out_tl, out_cb, out_cf, out_eslot = native_planner.native_fill(
        src, tgt, edge_ids, num_edges, num_tgt, R, CS, target_nc, pad_id,
        sort_sources, track_edges)
    if num_slices > 1:
        per = target_nc // num_slices
        out_cf[np.arange(num_slices) * per] = 1
    edge_slot = edge_pos = None
    if track_edges:
        edge_slot = out_eslot
        edge_pos = np.full(pad_id, len(edge_slot), np.int32)
        real = edge_slot < pad_id
        edge_pos[edge_slot[real]] = np.nonzero(real)[0].astype(np.int32)
    return SpmmPlan(
        src=out_src, tgt_local=out_tl, chunk_block=out_cb, chunk_first=out_cf,
        num_blocks=num_blocks, num_tgt=num_tgt,
        edge_slot=edge_slot, edge_pos=edge_pos, num_edge_ids=pad_id,
    )


def plan_spmm_repad(p: SpmmPlan, num_chunks: int) -> SpmmPlan:
    """Pad an existing plan with extra dump-block chunks.

    edge_pos is kept as-is: entries for absent canonical ids pointed past the
    old slot count and now land in appended all-padding slots, which produce
    exactly the 0 a mode="fill" gather would have (pad slots carry tl == R
    and weight/score 0)."""
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
        edge_slot=(None if p.edge_slot is None else np.concatenate(
            [p.edge_slot, np.full(extra * cs, p.num_edge_ids, np.int32)])),
        edge_pos=p.edge_pos,
        num_edge_ids=p.num_edge_ids,
    )
