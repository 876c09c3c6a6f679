"""Sampler semantics tests (ref model.py:252-339, 384-428)."""

import numpy as np
import pytest

from sagnn_tpu.data.sampler import Sampler, neg_sample
from sagnn_tpu.data.synthetic import synthetic_dataset


@pytest.fixture(scope="module")
def bundle():
    return synthetic_dataset(num_users=40, num_items=60, graph_num=3,
                             seq_len_range=(5, 15), test_size=12, seed=1)


@pytest.fixture()
def sampler(bundle):
    return Sampler(bundle=bundle, batch=8, samp_num=6, ssl_num=4,
                   pred_num=5, pos_length=10, test_size=12, seed=7)


def test_neg_sample_exclusions():
    rng = np.random.default_rng(0)
    label = np.zeros(20)
    label[[3, 5, 7]] = 1
    negs = neg_sample(rng, label, 50, 20, (4, 9))
    assert len(negs) == 50
    assert not set(negs) & {3, 5, 7, 4, 9}


def test_train_batch_shapes_and_semantics(sampler, bundle):
    bat = np.arange(8)
    b = sampler.train_batch(bat)
    P = 8 * 6
    assert b.uids.shape == (P,)
    assert b.seq.shape == (8, 10)
    m = b.pair_mask.astype(bool)
    # pairs only for users in the batch
    assert set(np.asarray(b.uids)[m]) <= set(bat.tolist())
    for j in np.nonzero(m)[0]:
        u = int(b.uids[j])
        pos = int(b.pos_iids[j])
        neg = int(b.neg_iids[j])
        seqs = bundle.sequences[u]
        # positive is from the user's train prefix (sequence[:-1])
        assert pos in seqs[:-1]
        # negative excludes the train row, the last item, and the test item
        assert neg not in seqs
        assert neg != bundle.tst_int[u]
        # useq_row indexes the right batch row
        assert bat[int(b.useq_row[j])] == u
    # all positives of one user in one step are the SAME item
    # (model.py:275-277: single target repeated sampNum times)
    for u in bat:
        pj = np.asarray(b.pos_iids)[m & (np.asarray(b.uids) == u)]
        assert len(set(pj.tolist())) <= 1


def test_train_sequence_alignment(sampler, bundle):
    bat = np.arange(8)
    b = sampler.train_batch(bat)
    for i, u in enumerate(bat):
        msk = np.asarray(b.seq_mask[i])
        row = np.asarray(b.seq[i])
        n = int(msk.sum())
        if n == 0:
            continue
        # right-aligned: mask is 0..0 1..1
        assert (msk[-n:] == 1).all() and (msk[:-n] == 0).all()
        # contents are a prefix of the user's training sequence
        # (posset[:-choose] for some choose >= 1)
        seqs = bundle.sequences[u][:-1]
        found = any(row[-n:].tolist() == seqs[max(0, len(seqs)-c-n):
                                             len(seqs)-c]
                    for c in range(1, 7))
        assert found


def test_ssl_batch_pairs(sampler, bundle):
    bat = np.arange(8)
    ssl = sampler.ssl_batch(bat)
    g = bundle.graph_num
    for k in range(g):
        m = ssl["ssl_mask"][k].astype(bool)
        rows = sampler._interval_rows[k]
        for j in np.nonzero(m)[0]:
            ua, ia = int(ssl["ssl_u_a"][k][j]), int(ssl["ssl_i_a"][k][j])
            ub, ib = int(ssl["ssl_u_b"][k][j]), int(ssl["ssl_i_b"][k][j])
            # items must be interacted items of their user in interval k
            assert ia in rows[ua]
            assert ib in rows[ub]
    # users with < 2 interactions in an interval contribute no pairs
    for k in range(g):
        n_pairs = int(ssl["ssl_mask"][k].sum())
        expect = sum(min(4, len(sampler._interval_rows[k][u]) // 2)
                     for u in bat)
        assert n_pairs == expect


def test_test_batch(sampler, bundle):
    bat = bundle.tst_usrs[:8]
    user_ids, cand, pos, seq, mask, valid = sampler.test_batch(bat)
    assert cand.shape == (8, 12)
    for i, u in enumerate(bat):
        # positive appended last (model.py:404)
        assert cand[i, -1] == bundle.tst_int[u] == pos[i]
        # negatives are the 1-indexed test_dict entries minus 1 (Q8)
        np.testing.assert_array_equal(
            cand[i, :-1], np.array(bundle.test_dict[u + 1][:11]) - 1)
        # test mode: full sequence fed (model.py:413-414)
        n = int(mask[i].sum())
        full = bundle.sequences[u]
        expect = full[-min(len(full), 10):]
        np.testing.assert_array_equal(seq[i][-len(expect):], expect)


def test_epoch_permutation(sampler, bundle):
    ids = sampler.epoch_user_ids(20)
    assert len(ids) == 20
    assert len(set(ids.tolist())) == 20
    assert ids.max() < bundle.num_users


@pytest.mark.parametrize("backend", ["numpy", "native"])
def test_train_batch_slice_matches_full(bundle, backend):
    """Multi-process determinism contract: sampling a slice of a batch
    (train_batch_slice) produces exactly the rows/columns the full-batch
    call yields — per-user RNG seeding + fixed slots (train arrays) and
    global-then-slice SSL pairing."""
    if backend == "native":
        from sagnn_tpu.data import native_sampler as ns
        if ns.load_library() is None:
            pytest.skip("native sampler not built")
    mk = lambda: Sampler(bundle=bundle, batch=8, samp_num=6, ssl_num=4,
                         pred_num=5, pos_length=10, test_size=12, seed=7,
                         backend=backend)
    bat = np.arange(8)
    full = mk().train_batch(bat)
    s0 = mk().train_batch_slice(bat, 0, 4)
    s1 = mk().train_batch_slice(bat, 4, 4)

    P = 4 * 6
    np.testing.assert_array_equal(full.uids[:P], s0.uids)
    np.testing.assert_array_equal(full.uids[P:], s1.uids)
    np.testing.assert_array_equal(full.pos_iids[:P], s0.pos_iids)
    np.testing.assert_array_equal(full.neg_iids[P:], s1.neg_iids)
    np.testing.assert_array_equal(full.pair_mask[:P], s0.pair_mask)
    np.testing.assert_array_equal(full.seq[:4], s0.seq)
    np.testing.assert_array_equal(full.seq[4:], s1.seq)
    np.testing.assert_array_equal(full.seq_mask[4:], s1.seq_mask)
    # local row ids + offset = global row ids
    np.testing.assert_array_equal(
        full.useq_row[P:][full.pair_mask[P:] > 0],
        s1.useq_row[s1.pair_mask > 0] + 4)
    # ssl pairing is global: the slices are exact column blocks
    np.testing.assert_array_equal(full.ssl_u_a[:, :4 * 4], s0.ssl_u_a)
    np.testing.assert_array_equal(full.ssl_i_b[:, 4 * 4:], s1.ssl_i_b)
    np.testing.assert_array_equal(full.ssl_mask[:, :4 * 4], s0.ssl_mask)


@pytest.mark.parametrize("backend", ["numpy", "native"])
def test_ssl_batch_window_matches_full(bundle, backend):
    """Any SSL pair-column window equals those columns of the full-batch
    arrays (per-user-seeded draws + deterministic count prefix — the
    multi-process dedup contract, VERDICT r2 #9), at every granularity
    including windows that split a user's draw range."""
    if backend == "native":
        from sagnn_tpu.data import native_sampler as ns
        if ns.load_library() is None:
            pytest.skip("native sampler not built")
    mk = lambda: Sampler(bundle=bundle, batch=8, samp_num=6, ssl_num=4,
                         pred_num=5, pos_length=10, test_size=12, seed=7,
                         backend=backend)
    bat = np.arange(8)
    full = mk().ssl_batch(bat)
    Pssl = 8 * 4
    for start, size in ((0, Pssl), (0, 8), (8, 8), (3, 7), (13, 11),
                        (Pssl - 4, 4)):
        got = mk().ssl_batch(bat, ssl_cols=(start, size))
        for key in full:
            np.testing.assert_array_equal(
                got[key], full[key][:, start:start + size],
                err_msg=f"{key} window ({start},{size})")


def test_ssl_slice_host_cost_scales(bundle):
    """The slice path must touch only the users whose draws land in the
    window (plus boundary users). Summed over N disjoint windows the
    per-user RNG constructions are therefore <= 2x one full pass (each
    user has an a-side owner and a b-side owner) — i.e. aggregate host
    work stays O(batch), split across hosts, instead of N full passes
    (VERDICT r2 #9). Counted via a probe on np.random.default_rng."""
    calls = []
    orig = np.random.default_rng

    def probe(seed=None):
        calls.append(seed)
        return orig(seed)

    s = Sampler(bundle=bundle, batch=40, samp_num=6, ssl_num=4, pred_num=5,
                pos_length=10, test_size=12, seed=7, backend="numpy")
    bat = np.arange(40)
    np.random.default_rng = probe
    try:
        calls.clear()
        s.ssl_batch(bat)
        n_full = len(calls)
        per_window = []
        for w in range(4):                      # 4 disjoint 1/4 windows
            calls.clear()
            s.ssl_batch(bat, ssl_cols=(w * 40, 40))
            per_window.append(len(calls))
    finally:
        np.random.default_rng = orig
    assert n_full > 0
    g = bundle.graph_num
    # every window does strictly less work than a full pass...
    assert all(n < n_full for n in per_window)
    # ...and the N hosts TOGETHER stay within 2x one full pass (a-side +
    # b-side owners) plus <=2 boundary users per window side per interval
    assert sum(per_window) <= 2 * n_full + 4 * 2 * 2 * g
