"""Host-side batch samplers (ref: model.py:252-339, 384-428; DataHandler.py:28-41).

The reference's per-batch Python loops are its host hot path (SURVEY.md §3.2).
This module keeps the exact sampling SEMANTICS but emits fixed-shape padded
arrays (+ masks) so the device executable never recompiles:

  * Train (ref sampleTrainBatch): per user, target = sequence[-choose] with
    choose ~ randint(1, max(min(pred_num+1, len(posset)-3), 1)), repeated
    sampNum=min(40, len(posset)) times; negatives rejection-sampled uniformly
    over items, excluding the user's train row, the last sequence item and
    the test item (negSamp, DataHandler.py:28-41). Users with an empty
    posset contribute no pairs (the reference's `range(sampNum)` over
    sampNum=0 — dead branch in model.py:269-272).
  * SSL (ref sampleSslBatch): per interval and user, sslNum =
    min(ssl_num, |row|//2) pairs of random interacted items drawn WITH
    replacement; the reference interleaves entries then pairs element j with
    element j+len/2 in the loss (model.py:186-196) — we perform that split
    here so the device gets aligned (A, B) halves.
  * Test (ref sampleTestBatch): candidates = testSize-1 precomputed
    1-indexed negatives (minus 1) + the positive appended LAST.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
import scipy.sparse as sp

from sagnn_tpu.data.io import DatasetBundle
from sagnn_tpu.models.selfgnn import TrainBatch


def _fill_sequence(row_items: List[int], pos_length: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Right-aligned, zero-padded sequence + mask (model.py:286-294)."""
    seq = np.zeros(pos_length, dtype=np.int32)
    mask = np.zeros(pos_length, dtype=np.float32)
    n = len(row_items)
    if n == 0:
        return seq, mask
    if n <= pos_length:
        seq[-n:] = row_items
        mask[-n:] = 1.0
    else:
        seq[:] = row_items[-pos_length:]
        mask[:] = 1.0
    return seq, mask


def neg_sample(rng: np.random.Generator, label_row: np.ndarray,
               samp_size: int, num_items: int,
               excluded: Tuple) -> np.ndarray:
    """Uniform rejection sampling (DataHandler.py:28-41): reject items the
    user interacted with (label_row != 0) and items in `excluded`."""
    out = np.empty(samp_size, dtype=np.int32)
    cur = 0
    while cur < samp_size:
        n_draw = max(8, 2 * (samp_size - cur))
        cands = rng.integers(0, num_items, size=n_draw)
        ok = label_row[cands] == 0
        for ex in excluded:
            if ex is not None:
                ok &= cands != ex
        good = cands[ok]
        take = min(len(good), samp_size - cur)
        out[cur:cur + take] = good[:take]
        cur += take
    return out


@dataclass
class Sampler:
    """Stateful host sampler over one DatasetBundle."""

    bundle: DatasetBundle
    batch: int
    samp_num: int
    ssl_num: int
    pred_num: int
    pos_length: int
    test_size: int
    seed: int = 100
    backend: str = "auto"   # "auto" | "native" | "numpy"

    def __post_init__(self):
        self.rng = np.random.default_rng(self.seed)
        b = self.bundle
        self._trn_csr = b.trn_mat.tocsr()
        self._sub_csrs = [m.tocsr() for m in b.sub_mats]
        self._rows_cache = None     # see _interval_rows
        self._deg_cache = None      # see _max_train_deg
        self._native = None
        if self.backend in ("auto", "native"):
            from sagnn_tpu.data import native_sampler as ns
            lib = ns.load_library()
            if lib is not None:
                self._native = (lib, ns.NativeSamplerState(
                    b.sequences, self._trn_csr, self._sub_csrs, b.tst_int))
            elif self.backend == "native":
                raise RuntimeError("native sampler library unavailable "
                                   "(make -C sagnn_tpu/native)")

    @property
    def _interval_rows(self):
        """Per-user interval rows (nonzero columns), built LAZILY on first
        numpy-SSL use: the C++ sampler walks the CSR directly, so eagerly
        materializing g × num_users small arrays (millions of allocations at
        1M-user scale) would be pure startup waste when the native backend
        is active. The reference re-densifies rows every batch
        (model.py:307)."""
        if self._rows_cache is None:
            b = self.bundle
            self._rows_cache = [
                [m.indices[m.indptr[u]:m.indptr[u + 1]]
                 for u in range(b.num_users)]
                for m in self._sub_csrs
            ]
        return self._rows_cache

    @property
    def _max_train_deg(self):
        """Exclusion-list width for full_sort_batch: the max train-row
        degree, rounded up to a multiple of 64 so the device executable
        shape is stable across runs of similar datasets."""
        if self._deg_cache is None:
            deg = np.diff(self._trn_csr.indptr)
            self._deg_cache = max(
                64, -(-int(deg.max(initial=1)) // 64) * 64)
        return self._deg_cache

    # -- train ------------------------------------------------------------

    def epoch_user_ids(self, trn_num: int) -> np.ndarray:
        """np.random.permutation(num_users)[:trnNum] (model.py:343)."""
        return self.rng.permutation(self.bundle.num_users)[:trn_num]

    def train_batch(self, bat_ids: np.ndarray,
                    batch_cap: int | None = None,
                    ssl_ids: np.ndarray | None = None,
                    ssl_cols: Tuple[int, int] | None = None) -> TrainBatch:
        """One train batch for `bat_ids`.

        Determinism contract (multi-process DP): per-user draws are seeded
        by mix(batch_seed, user_id) and land in fixed per-user slot ranges,
        so sampling a SLICE of a batch yields exactly the rows a full-batch
        call would — each host samples only its own batch rows
        (`train_batch_slice`) and the assembled global batch is identical
        to a single-host run. batch_cap sizes the output arrays (defaults
        to self.batch); ssl_ids overrides the id set for the SSL half
        (whose half-split pairing is GLOBAL across the batch); ssl_cols
        (start, size) samples only that window of the SSL pair columns —
        see ssl_batch.
        """
        batch_seed = int(self.rng.integers(0, 2 ** 63))
        ssl = self.ssl_batch(bat_ids if ssl_ids is None else ssl_ids,
                             ssl_cols=ssl_cols)
        if self._native is not None:
            return self._train_batch_native(bat_ids, batch_seed,
                                            batch_cap or self.batch, ssl)
        return self._train_batch_numpy(bat_ids, batch_seed,
                                       batch_cap or self.batch, ssl)

    def train_batch_slice(self, bat_ids: np.ndarray, start: int,
                          size: int) -> TrainBatch:
        """This host's slice of the global batch `bat_ids` (rows
        [start, start+size)): train arrays are sampled only for the local
        users, and the SSL pair arrays only for this host's pair-column
        window (both identical to the corresponding full-batch
        rows/columns, per the determinism contracts in train_batch and
        ssl_batch — host sampling cost is O(batch/N) per host). The SSL
        prefix sums still walk the full id list (pure CSR degree reads,
        no RNG). useq_row stays local (0-based); the caller offsets it by
        `start` when assembling the global batch."""
        return self.train_batch(
            bat_ids[start:start + size], batch_cap=size, ssl_ids=bat_ids,
            ssl_cols=(start * self.ssl_num, size * self.ssl_num))

    def _train_batch_native(self, bat_ids: np.ndarray, seed: int,
                            batch_cap: int, ssl: dict) -> TrainBatch:
        from sagnn_tpu.data import native_sampler as ns
        lib, state = self._native
        uids, pos_iids, neg_iids, useq_row, pair_mask, seq, mask = \
            ns.native_train_batch(lib, state, bat_ids, batch_cap,
                                  self.samp_num, self.pred_num,
                                  self.pos_length, self.bundle.num_items,
                                  seed)
        return TrainBatch(uids=uids, pos_iids=pos_iids, neg_iids=neg_iids,
                          useq_row=useq_row, pair_mask=pair_mask, seq=seq,
                          seq_mask=mask, **ssl)

    def _train_batch_numpy(self, bat_ids: np.ndarray, seed: int,
                           batch_cap: int, ssl: dict) -> TrainBatch:
        b = self.bundle
        B, P = batch_cap, batch_cap * self.samp_num
        uids = np.zeros(P, dtype=np.int32)
        pos_iids = np.zeros(P, dtype=np.int32)
        neg_iids = np.zeros(P, dtype=np.int32)
        useq_row = np.zeros(P, dtype=np.int32)
        pair_mask = np.zeros(P, dtype=np.float32)
        seq = np.zeros((B, self.pos_length), dtype=np.int32)
        seq_mask = np.zeros((B, self.pos_length), dtype=np.float32)

        label_rows = self._trn_csr[bat_ids].toarray()
        for i, u in enumerate(bat_ids):
            # per-user RNG + fixed slots (determinism contract, train_batch)
            rng_u = np.random.default_rng((seed, int(u)))
            full_seq = b.sequences[u]
            posset = full_seq[:-1]
            samp = min(self.samp_num, len(posset))
            choose = 1
            if samp > 0:
                cur = i * self.samp_num
                hi = max(min(self.pred_num + 1, len(posset) - 3), 1)
                choose = int(rng_u.integers(1, hi + 1))  # randint incl.
                pos = posset[-choose]
                negs = neg_sample(rng_u, label_rows[i], samp,
                                  b.num_items,
                                  (full_seq[-1], b.tst_int[u]))
                uids[cur:cur + samp] = u
                useq_row[cur:cur + samp] = i
                pos_iids[cur:cur + samp] = pos
                neg_iids[cur:cur + samp] = negs
                pair_mask[cur:cur + samp] = 1.0
            seq[i], seq_mask[i] = _fill_sequence(posset[:-choose] if choose
                                                 else posset, self.pos_length)
        return TrainBatch(uids=uids, pos_iids=pos_iids, neg_iids=neg_iids,
                          useq_row=useq_row, pair_mask=pair_mask, seq=seq,
                          seq_mask=seq_mask, **ssl)

    # -- ssl ---------------------------------------------------------------

    def ssl_batch(self, bat_ids: np.ndarray,
                  ssl_cols: Tuple[int, int] | None = None) -> dict:
        """SSL pair arrays [g, Pssl] (or the [g, size] column window
        `ssl_cols=(start, size)` of them).

        Reference layout (model.py:186-196 + 328-338): interleaved
        (u, pos_j)(u, neg_j) draws flattened across the batch, split at the
        global half — pair column j pairs flat entry j with entry half+j.

        Determinism contract (multi-process DP, mirrors train_batch):
        per-user draws are seeded by mix(interval_seed, uid) and land at
        flat positions fixed by the deterministic per-user pair counts
        (min(ssl_num, |row|//2), prefix-summed over the batch), so any
        column window equals those columns of the full-batch arrays. A
        host therefore samples only the users covering its own window —
        O(batch/N) RNG work per host; the prefix sum itself is pure CSR
        degree reads over the full id list.
        """
        g = self.bundle.graph_num
        col_start, col_size = ssl_cols or (0, self.batch * self.ssl_num)
        # one seed per interval, drawn identically regardless of the window
        # (keeps self.rng's stream position slice-invariant)
        seeds = [int(self.rng.integers(0, 2 ** 63)) for _ in range(g)]
        out = {k: np.zeros((g, col_size),
                           np.float32 if k == "ssl_mask" else np.int32)
               for k in ("ssl_u_a", "ssl_i_a", "ssl_u_b", "ssl_i_b",
                         "ssl_mask")}
        for k in range(g):
            if self._native is not None:
                from sagnn_tpu.data import native_sampler as ns
                lib, state = self._native
                u_a, i_a, u_b, i_b, m = ns.native_ssl_batch(
                    lib, state, k, bat_ids, self.ssl_num, seeds[k],
                    col_start, col_size)
                out["ssl_u_a"][k] = u_a
                out["ssl_i_a"][k] = i_a
                out["ssl_u_b"][k] = u_b
                out["ssl_i_b"][k] = i_b
                out["ssl_mask"][k] = m
            else:
                self._ssl_interval_numpy(k, bat_ids, seeds[k], col_start,
                                         col_size, out)
        return out

    def _ssl_interval_numpy(self, k: int, bat_ids: np.ndarray, seed: int,
                            col_start: int, col_size: int,
                            out: dict) -> None:
        """Numpy twin of sampler.cc sample_ssl_batch (same contract; the
        two backends use different RNGs, so values differ but structure,
        membership, and slice-consistency are identical)."""
        csr = self._sub_csrs[k]
        ids = np.asarray(bat_ids, dtype=np.int64)
        deg = csr.indptr[ids + 1] - csr.indptr[ids]
        counts = 2 * np.minimum(self.ssl_num, deg // 2).astype(np.int64)
        prefix = np.zeros(len(ids) + 1, np.int64)
        np.cumsum(counts, out=prefix[1:])
        total = int(prefix[-1])
        half = total // 2
        col_end = col_start + col_size

        def emit(lo, hi, base, du, di):
            if hi <= lo:
                return
            i = max(0, int(np.searchsorted(prefix, lo, "right")) - 1)
            while i < len(ids) and prefix[i] < hi:
                p0, c = int(prefix[i]), int(counts[i])
                i += 1
                if c == 0:
                    continue
                s, e = max(lo, p0), min(hi, p0 + c)
                if s >= e:
                    continue
                u = int(ids[i - 1])
                rng_u = np.random.default_rng((seed, u))
                row = csr.indices[csr.indptr[u]:csr.indptr[u + 1]]
                n = c // 2
                draws = rng_u.choice(row, c)      # with replacement
                inter = np.empty(c, np.int32)
                inter[0::2] = draws[:n]
                inter[1::2] = draws[n:]
                du[s - base:e - base] = u
                di[s - base:e - base] = inter[s - p0:e - p0]

        emit(col_start, min(col_end, half), col_start,
             out["ssl_u_a"][k], out["ssl_i_a"][k])
        emit(half + col_start, min(half + col_end, total),
             half + col_start, out["ssl_u_b"][k], out["ssl_i_b"][k])
        real = max(0, min(col_end, half) - col_start)
        out["ssl_mask"][k, :real] = 1.0

    # -- test ---------------------------------------------------------------

    def test_batch(self, bat_ids: np.ndarray, test_mode: bool = True,
                   batch_cap: int | None = None):
        """Returns (user_ids [B], cand_iids [B, C], pos_items [B],
        seq [B, L], seq_mask [B, L], valid [B]) — positives appended LAST in
        the candidate axis (model.py:403-404).

        batch_cap sizes the output arrays (defaults to self.batch). Eval
        sampling is RNG-free and per-row, so sampling a SLICE of a batch
        yields exactly the corresponding rows of the full-batch arrays —
        each host in a multi-process run samples only its own rows."""
        b = self.bundle
        B = batch_cap or self.batch
        C = self.test_size
        user_ids = np.zeros(B, dtype=np.int32)
        cand = np.zeros((B, C), dtype=np.int32)
        pos_items = np.zeros(B, dtype=np.int32)
        seq = np.zeros((B, self.pos_length), dtype=np.int32)
        seq_mask = np.zeros((B, self.pos_length), dtype=np.float32)
        valid = np.zeros(B, dtype=np.float32)

        for i, u in enumerate(bat_ids):
            if test_mode:
                pos = b.tst_int[u]
                posset = b.sequences[u]
            else:
                pos = b.sequences[u][-1]
                posset = b.sequences[u][:-1]
            negs = np.array(b.test_dict[u + 1][:C - 1]) - 1  # 1-indexed (Q8)
            cand[i] = np.concatenate([negs, [pos]])
            user_ids[i] = u
            pos_items[i] = pos
            seq[i], seq_mask[i] = _fill_sequence(posset, self.pos_length)
            valid[i] = 1.0
        return user_ids, cand, pos_items, seq, seq_mask, valid

    def full_sort_batch(self, bat_ids: np.ndarray, test_mode: bool = True,
                        batch_cap: int | None = None):
        """Full-catalog evaluation batch (no reference analog — the standard
        strict protocol): the positive is ranked against ALL items except the
        user's own input interactions.

        Returns (user_ids [B], pos_items [B], seq [B, L], seq_mask [B, L],
        excl_idx [B, K] int32, valid [B]). `excl_idx` lists the user's
        train-row item ids (their interaction history) minus the positive,
        padded with num_items (an out-of-range id the device masks by
        range check); K is the dataset's max train degree. Host memory
        is O(B·max_deg) instead of a dense [B, num_items] bool matrix —
        the difference between 25 MB and 256 GB/batch at 1M items.
        batch_cap: as in test_batch (per-host slice sampling).
        """
        b = self.bundle
        B = batch_cap or self.batch
        K = self._max_train_deg
        user_ids = np.zeros(B, dtype=np.int32)
        pos_items = np.zeros(B, dtype=np.int32)
        seq = np.zeros((B, self.pos_length), dtype=np.int32)
        seq_mask = np.zeros((B, self.pos_length), dtype=np.float32)
        excl_idx = np.full((B, K), b.num_items, dtype=np.int32)
        valid = np.zeros(B, dtype=np.float32)

        for i, u in enumerate(bat_ids):
            if test_mode:
                pos = b.tst_int[u]
                posset = b.sequences[u]
            else:
                pos = b.sequences[u][-1]
                posset = b.sequences[u][:-1]
            row = self._trn_csr.indices[
                self._trn_csr.indptr[u]:self._trn_csr.indptr[u + 1]]
            row = row[row != pos]  # the positive is never excluded
            excl_idx[i, :len(row)] = row
            user_ids[i] = u
            pos_items[i] = pos
            seq[i], seq_mask[i] = _fill_sequence(posset, self.pos_length)
            valid[i] = 1.0
        return user_ids, pos_items, seq, seq_mask, excl_idx, valid
