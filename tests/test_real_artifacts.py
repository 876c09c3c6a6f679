"""Pin the loader to the REAL shipped reference artifacts.

The reference mount ships exactly one real-data file per dataset:
`Datasets/{gowalla,movielens,yelp,amazon}/tst_int` (the only pickles
present — the training matrices are absent from the image). These tests
load all four through the `data/io.py` path and assert the documented
format (VERDICT r4 #7): the user counts the run scripts imply, 10,000
non-None test entries each (BASELINE.md evaluation-protocol row), and
0-indexed item ids consumed directly (DataHandler.py:96-106 — unlike
`test_dict`, which is 1-indexed, quirk Q8).
"""

import os
from dataclasses import dataclass

import numpy as np
import pytest

from sagnn_tpu.data.io import DatasetBundle, load_tst_int

REF_DATASETS = "/root/reference/Datasets"

# users per dataset as BASELINE.md documents them (derived from the
# reference's own len(tstInt) at load time, DataHandler.py:96-106)
EXPECTED_USERS = {
    "gowalla": 48_653,
    "movielens": 24_312,
    "yelp": 19_751,
    "amazon": 11_199,
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATASETS),
    reason="reference Datasets mount not present")


@pytest.mark.parametrize("name", sorted(EXPECTED_USERS))
def test_real_tst_int_loads_and_matches_documented_format(name):
    tst_int = load_tst_int(os.path.join(REF_DATASETS, name, "tst_int"))
    assert tst_int.dtype == object
    assert len(tst_int) == EXPECTED_USERS[name]

    non_none = [v for v in tst_int if v is not None]
    # BASELINE.md: the reference evaluates 10,000 test users per dataset
    assert len(non_none) == 10_000
    # entries are plain non-negative integer item ids, used 0-indexed
    # (model.py feeds them to the score gather unshifted)
    vals = np.array(non_none)
    assert np.issubdtype(vals.dtype, np.integer)
    assert vals.min() >= 0
    # sanity ceiling: far below any plausible catalog size overflow
    assert vals.max() < 10_000_000


@pytest.mark.parametrize("name", sorted(EXPECTED_USERS))
def test_real_tst_usrs_mask_semantics(name):
    """tst_usrs must reproduce DataHandler.py:104-106's argwhere(!= None)
    on the real object arrays (None-vs-0 distinction matters: item id 0
    is a VALID test item and must not be masked out)."""
    tst_int = load_tst_int(os.path.join(REF_DATASETS, name, "tst_int"))
    bundle = DatasetBundle(
        num_users=len(tst_int), num_items=1, trn_mat=None, sub_mats=[],
        time_mat=None, sequences=[], tst_int=tst_int, test_dict={})
    usrs = bundle.tst_usrs
    assert len(usrs) == 10_000
    assert np.all(np.diff(usrs) > 0)            # strictly increasing uids
    assert usrs.min() >= 0 and usrs.max() < len(tst_int)
    # every selected user has a real item; every skipped one is None
    sel = set(usrs.tolist())
    for u, v in enumerate(tst_int):
        assert (u in sel) == (v is not None)
