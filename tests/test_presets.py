"""Preset-matrix smoke: every dataset preset's structural shape trains.

The four launch configs (scripts/{gowalla,movielens,yelp,amazon}.sh, mirrored
in config.PRESETS) exercise distinct code paths: graphNum 3/6/12/5 (12 gives
sparse/empty tiny intervals — the [[0,0]] degenerate-graph convention),
gnn_layer 2/3, att_layer 1/3/2/4, keepRate 0.5 (LSTM output dropout,
ref model.py:141-142), and amazon's pred_num=0 (the sampler's
choose ∈ [1, max(min(pred_num+1, len-3), 1)] degenerates to always the
penultimate position, ref model.py:275). Each preset shape runs one train
epoch + one test epoch on tiny synthetic data.
"""

import dataclasses

import numpy as np
import pytest

from sagnn_tpu.config import PRESETS
from sagnn_tpu.data.synthetic import synthetic_dataset
from sagnn_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name", ["gowalla", "movielens", "yelp", "amazon"])
def test_preset_shape_trains(name, tmp_path):
    preset = PRESETS[name]
    mcfg = dataclasses.replace(
        preset.model, latdim=16, num_heads=4, ssldim=8, pos_length=16)
    tcfg = dataclasses.replace(
        preset.train, batch=8, samp_num=4, ssl_num=3, trn_num=16,
        test_size=8, epoch=1, tst_epoch=1, save_path=f"tiny_{name}")
    cfg = dataclasses.replace(preset, model=mcfg, train=tcfg)

    bundle = synthetic_dataset(num_users=24, num_items=40,
                               graph_num=mcfg.graph_num, test_size=8,
                               seed=17)
    if name == "yelp":
        # 12 intervals over tiny histories: some must be near-empty so the
        # degenerate-interval convention is actually on the path
        nnz = np.asarray([m.nnz for m in bundle.sub_mats])
        assert nnz.min() < nnz.max()

    tr = Trainer(cfg, bundle, ckpt_root=str(tmp_path), pad_multiple=32)
    stats = tr.train_epoch(verbose=False)
    assert np.isfinite(stats["Loss"])
    mets = tr.test_epoch()
    assert 0.0 <= mets["HR"] <= 1.0
    assert 0.0 <= mets["NDCG"] <= mets["HR"] + 1e-9


def test_pred_num_zero_targets_penultimate():
    """amazon's pred_num=0: choose degenerates to 1, so the train target is
    ALWAYS the penultimate item of the full sequence (posset = sequence[:-1]
    with the test item held out; target = posset[-1] = sequence[-2]), never
    an earlier position."""
    preset = PRESETS["amazon"]
    bundle = synthetic_dataset(num_users=16, num_items=30,
                               graph_num=preset.model.graph_num, test_size=8,
                               seed=5)
    from sagnn_tpu.data.sampler import Sampler
    s = Sampler(bundle=bundle, batch=8, samp_num=4, ssl_num=3,
                pred_num=0, pos_length=16, test_size=8, seed=0)
    batch = s.train_batch(np.arange(8))
    pos = np.asarray(batch.pos_iids)
    uids = np.asarray(batch.uids)
    mask = np.asarray(batch.pair_mask)
    assert mask.sum() > 0
    for u, it, m in zip(uids, pos, mask):
        if m == 0:
            continue
        # posset = sequence[:-1] (test item held out); choose=1 ->
        # target = posset[-1] = the penultimate item of the full sequence
        assert it == bundle.sequences[u][-2], (u, it, bundle.sequences[u][-3:])
