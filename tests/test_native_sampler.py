"""Native (C++) vs numpy sampler equivalence: same invariants, same counts,
statistically matching distributions."""

import numpy as np
import pytest

from sagnn_tpu.data import native_sampler as ns
from sagnn_tpu.data.sampler import Sampler
from sagnn_tpu.data.synthetic import synthetic_dataset


@pytest.fixture(scope="module")
def bundle():
    return synthetic_dataset(num_users=60, num_items=90, graph_num=3,
                             seq_len_range=(6, 20), test_size=12, seed=4)


@pytest.fixture(scope="module")
def samplers(bundle):
    if ns.load_library() is None:
        pytest.skip("native sampler library unavailable")
    mk = lambda backend: Sampler(
        bundle=bundle, batch=16, samp_num=6, ssl_num=4, pred_num=5,
        pos_length=12, test_size=12, seed=11, backend=backend)
    return mk("numpy"), mk("native")


def test_same_pair_counts(samplers, bundle):
    s_np, s_cc = samplers
    bat = np.arange(16)
    b1 = s_np.train_batch(bat)
    b2 = s_cc.train_batch(bat)
    # deterministic per-user pair counts: min(samp_num, len(posset))
    assert b1.pair_mask.sum() == b2.pair_mask.sum()
    for k in range(bundle.graph_num):
        assert b1.ssl_mask[k].sum() == b2.ssl_mask[k].sum()


def test_native_invariants(samplers, bundle):
    _, s_cc = samplers
    bat = np.arange(16, 32)
    b = s_cc.train_batch(bat)
    m = np.asarray(b.pair_mask).astype(bool)
    for j in np.nonzero(m)[0]:
        u = int(b.uids[j])
        assert u in bat
        pos, neg = int(b.pos_iids[j]), int(b.neg_iids[j])
        assert pos in bundle.sequences[u][:-1]
        assert neg not in bundle.sequences[u]
        assert neg != bundle.tst_int[u]
        assert bat[int(b.useq_row[j])] == u
    # per-user single positive (reference Q7 semantics)
    for u in bat:
        sel = m & (np.asarray(b.uids) == u)
        assert len(set(np.asarray(b.pos_iids)[sel].tolist())) <= 1
    # sequences right-aligned
    for i in range(16):
        msk = np.asarray(b.seq_mask[i])
        n = int(msk.sum())
        if n:
            assert (msk[-n:] == 1).all() and (msk[:-n] == 0).all()


def test_native_ssl_invariants(samplers, bundle):
    _, s_cc = samplers
    bat = np.arange(16)
    ssl = s_cc.ssl_batch(bat)
    for k in range(bundle.graph_num):
        rows = s_cc._interval_rows[k]
        mask = ssl["ssl_mask"][k].astype(bool)
        for j in np.nonzero(mask)[0]:
            ua, ia = int(ssl["ssl_u_a"][k][j]), int(ssl["ssl_i_a"][k][j])
            ub, ib = int(ssl["ssl_u_b"][k][j]), int(ssl["ssl_i_b"][k][j])
            assert ia in rows[ua] and ib in rows[ub]


def test_negative_distribution_uniformity(samplers, bundle):
    """Negatives should be ~uniform over non-excluded items (chi-square-ish
    sanity, both backends)."""
    s_np, s_cc = samplers
    for s in (s_np, s_cc):
        counts = np.zeros(bundle.num_items)
        bat = np.arange(16)
        for _ in range(30):
            b = s.train_batch(bat)
            m = np.asarray(b.pair_mask).astype(bool)
            np.add.at(counts, np.asarray(b.neg_iids)[m], 1)
        # items interacted by everyone excluded -> some zeros fine; the
        # non-zero counts should not be wildly skewed (uniform sampler)
        nz = counts[counts > 0]
        assert nz.max() / max(nz.mean(), 1) < 5.0


def test_native_speed_advantage(samplers):
    import time
    s_np, s_cc = samplers
    bat = np.arange(16)
    for s in (s_np, s_cc):
        s.train_batch(bat)  # warm

    # min-of-N timing: a single scheduler hiccup on a loaded 2-CPU box
    # flipped the old one-shot comparison; the minimum over independent
    # repeats is the standard noise-immune estimator for "which is faster".
    # Each rep times a RUN of batches (amortizes per-call jitter), and the
    # assertion carries a 10% tolerance: the claim under test is "the
    # native path is not slower", not a micro-ranking at one tiny batch
    # (the 34x advantage is measured at realistic sizes in bench scripts).
    def best(sampler, reps=7, run=5):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _r in range(run):
                sampler.train_batch(bat)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    assert best(s_cc) < best(s_np) * 1.1
