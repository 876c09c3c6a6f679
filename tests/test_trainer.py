"""End-to-end trainer tests: loss decreases, checkpoint/resume roundtrip,
noise-robustness data mode."""

import os

import jax
import numpy as np
import pytest

from sagnn_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from sagnn_tpu.data.io import load_dataset, save_dataset
from sagnn_tpu.data.synthetic import synthetic_dataset
from sagnn_tpu.train.trainer import Trainer

CFG = Config(
    model=ModelConfig(graph_num=3, gnn_layer=2, att_layer=1, latdim=16,
                      num_heads=4, ssldim=8, pos_length=16, keep_rate=1.0),
    train=TrainConfig(batch=8, samp_num=5, ssl_num=3, trn_num=32,
                      test_size=10, epoch=2, tst_epoch=1, lr=5e-3,
                      reg=1e-4, ssl_reg=1e-6),
)


@pytest.fixture(scope="module")
def bundle():
    return synthetic_dataset(num_users=32, num_items=50, graph_num=3,
                             test_size=10, seed=0)


@pytest.mark.slow
def test_loss_decreases(bundle, tmp_path_factory):
    tr = Trainer(CFG, bundle,
                 ckpt_root=str(tmp_path_factory.mktemp("ck")),
                 pad_multiple=64)
    first = tr.train_epoch(verbose=False)
    for _ in range(4):
        last = tr.train_epoch(verbose=False)
    assert last["preLoss"] < first["preLoss"]
    mets = tr.test_epoch()
    assert 0.0 <= mets["HR"] <= 1.0
    assert 0.0 <= mets["NDCG"] <= mets["HR"] + 1e-9


@pytest.mark.slow
def test_full_sort_eval(bundle, tmp_path_factory):
    """Full-catalog protocol: sampler exclusion semantics + trainer epoch."""
    tr = Trainer(CFG, bundle,
                 ckpt_root=str(tmp_path_factory.mktemp("ckfs")),
                 pad_multiple=64)
    bat = np.asarray(bundle.tst_usrs)[:8]
    user_ids, pos, seq, mask, excl_idx, valid = tr.sampler.full_sort_batch(bat)
    trn = bundle.trn_mat.tocsr()
    for i, u in enumerate(bat):
        row = set(trn.indices[trn.indptr[u]:trn.indptr[u + 1]].tolist())
        assert pos[i] == bundle.tst_int[u]
        ex = set(excl_idx[i][excl_idx[i] < bundle.num_items].tolist())
        assert pos[i] not in ex  # positive never excluded
        assert ex == row - {pos[i]}
    mets = tr.test_epoch(full_sort=True)
    assert 0.0 <= mets["HR"] <= 1.0
    assert 0.0 <= mets["NDCG"] <= mets["HR"] + 1e-9
    # full-sort is strictly harder than 10-candidate ranking on average
    easy = tr.test_epoch(full_sort=False)
    assert mets["HR"] <= easy["HR"] + 1e-9
    # the streaming (chunked-catalog) full-sort eval is protocol-identical
    import dataclasses
    cfg_stream = CFG.replace(train=dataclasses.replace(
        CFG.train, full_sort_chunk=16))
    tr_s = Trainer(cfg_stream, bundle,
                   ckpt_root=str(tmp_path_factory.mktemp("ckfss")),
                   pad_multiple=64)
    tr_s.state = jax.tree_util.tree_map(lambda x: x, tr.state)
    mets_s = tr_s.test_epoch(full_sort=True)
    for key in mets:
        np.testing.assert_allclose(mets_s[key], mets[key], rtol=1e-5,
                                   err_msg=key)


@pytest.mark.slow
def test_trajectory_exact_resume(bundle, tmp_path_factory):
    """A run killed after epoch 2 and resumed must replay the uninterrupted
    run's epochs 2-3 bit-for-bit: the checkpoint carries the sampler's
    bit-generator state and the trainer's JAX key (VERDICT r2 #3; the
    reference loses all RNG state on resume, model.py:522-527)."""
    root = str(tmp_path_factory.mktemp("ckrng"))

    # uninterrupted 4-epoch run
    tr_full = Trainer(CFG, bundle, ckpt_root=root + "/full", pad_multiple=64)
    losses_full = [tr_full.train_epoch(verbose=False)["Loss"]
                   for _ in range(4)]

    # interrupted: 2 epochs, save (as the best-NDCG path would, with the
    # RNG sidecar), then resume in a FRESH trainer and run 2 more
    tr_a = Trainer(CFG, bundle, ckpt_root=root + "/ab", pad_multiple=64)
    losses_a = [tr_a.train_epoch(verbose=False)["Loss"] for _ in range(2)]
    np.testing.assert_allclose(losses_a, losses_full[:2], rtol=1e-6)
    tr_a.history.append("Train", {"Loss": losses_a[-1], "preLoss": 0.0})
    tr_a.ckpt.save(tr_a.state, tr_a.history, CFG,
                   rng_state=tr_a.capture_rng_state(next_epoch=2))

    tr_b = Trainer(CFG, bundle, ckpt_root=root + "/ab", pad_multiple=64)
    state, hist = tr_b.ckpt.restore(tr_b.state)
    assert state is not None
    tr_b.state = state
    rs = tr_b.ckpt.load_rng()
    assert rs is not None
    assert tr_b.restore_rng_state(rs) == 2
    losses_b = [tr_b.train_epoch(verbose=False)["Loss"] for _ in range(2)]
    np.testing.assert_allclose(losses_b, losses_full[2:], rtol=1e-6)


@pytest.mark.slow
def test_resume_keeps_better_checkpoint(bundle, tmp_path_factory, monkeypatch):
    """After resume, the best-NDCG tracker is seeded from the restored
    history: a post-resume test epoch with a WORSE NDCG must not overwrite
    the better checkpoint (code-review r3 finding: max_ndcg restarted at
    0.0, so the first post-resume test always saved)."""
    import dataclasses
    root = str(tmp_path_factory.mktemp("ckbest"))
    cfg = CFG.replace(train=dataclasses.replace(
        CFG.train, epoch=2, tst_epoch=1))
    tr = Trainer(cfg, bundle, ckpt_root=root, pad_multiple=64)
    tr.train_epoch(verbose=False)
    # simulate a completed epoch-0 with a good test result, saved
    tr.history.append("Train", {"Loss": 1.0, "preLoss": 0.9})
    tr.history.append("Test", {"HR": 0.9, "NDCG": 0.8})
    tr.ckpt.save(tr.state, tr.history, cfg,
                 rng_state=tr.capture_rng_state(next_epoch=1))

    tr2 = Trainer(cfg, bundle, ckpt_root=root, pad_multiple=64)
    saves = []
    monkeypatch.setattr(
        tr2.ckpt, "save",
        lambda *a, **k: saves.append(k.get("rng_state")))
    monkeypatch.setattr(
        tr2, "test_epoch",
        lambda *a, **k: {"HR": 0.1, "NDCG": 0.05})  # worse than restored
    res = tr2.run(resume=True)
    assert saves == []              # the better checkpoint was kept
    assert res["NDCG"] == 0.8       # max line reports the restored best


@pytest.mark.slow
def test_checkpoint_roundtrip(bundle, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ck2"))
    tr = Trainer(CFG, bundle, ckpt_root=root, pad_multiple=64)
    tr.train_epoch(verbose=False)
    tr.history.append("Train", {"Loss": 1.0, "preLoss": 0.9})
    tr.ckpt.save(tr.state, tr.history)

    tr2 = Trainer(CFG, bundle, ckpt_root=root, pad_multiple=64)
    state, hist = tr2.ckpt.restore(tr2.state)
    assert state is not None
    assert hist.data["TrainLoss"] == [1.0]
    for a, b in zip(jax.tree_util.tree_leaves(tr.state["params"]),
                    jax.tree_util.tree_leaves(state["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resume-epoch formula (model.py:46)
    assert tr2.ckpt.resume_epoch(hist, tst_epoch=3) == 1


def test_checkpoint_async_save(bundle, tmp_path_factory):
    """block=False: the tmp->state commit is deferred until the next
    save/restore/finalize; history appended AFTER the save must not leak
    into the committed sidecar (the snapshot semantics)."""
    import os
    root = str(tmp_path_factory.mktemp("ck_async"))
    tr = Trainer(CFG, bundle, ckpt_root=root, pad_multiple=64)
    tr.history.append("Train", {"Loss": 1.0, "preLoss": 0.9})
    tr.ckpt.save(tr.state, tr.history, block=False)
    tr.history.append("Train", {"Loss": 0.5, "preLoss": 0.4})  # post-save
    tr.ckpt.finalize()
    assert os.path.exists(os.path.join(root, CFG.train.save_path, "state"))
    tr.ckpt.finalize()  # idempotent

    tr2 = Trainer(CFG, bundle, ckpt_root=root, pad_multiple=64)
    state, hist = tr2.ckpt.restore(tr2.state)
    assert state is not None
    assert hist.data["TrainLoss"] == [1.0]  # snapshot, not [1.0, 0.5]
    for a, b in zip(jax.tree_util.tree_leaves(tr.state["params"]),
                    jax.tree_util.tree_leaves(state["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restore() commits a pending save by itself (no explicit finalize)
    tr.history.append("Train", {"Loss": 0.3, "preLoss": 0.2})
    tr.ckpt.save(tr.state, tr.history, block=False)
    _, hist4 = tr.ckpt.restore(tr.state)
    assert hist4.data["TrainLoss"] == [1.0, 0.5, 0.3]


def test_dataset_io_roundtrip(bundle, tmp_path):
    save_dataset(str(tmp_path / "ds"), bundle)
    loaded = load_dataset(str(tmp_path / "ds"))
    assert loaded.num_users == bundle.num_users
    assert loaded.num_items == bundle.num_items
    assert loaded.graph_num == bundle.graph_num
    assert (loaded.trn_mat != bundle.trn_mat).nnz == 0
    for a, b in zip(loaded.sub_mats, bundle.sub_mats):
        assert (a != b).nnz == 0
    np.testing.assert_array_equal(loaded.tst_usrs, bundle.tst_usrs)
    assert loaded.test_dict == bundle.test_dict


def test_noise_mode(bundle, tmp_path):
    import pickle
    import scipy.sparse as sp
    save_dataset(str(tmp_path / "ds"), bundle)
    # write a perturbed matrix under the noise_%.2f name (DataHandler.py:87-90)
    noised = [bundle.trn_mat, list(bundle.sub_mats), bundle.time_mat]
    with open(tmp_path / "ds" / "noise_0.10", "wb") as f:
        pickle.dump(noised, f)
    loaded = load_dataset(str(tmp_path / "ds"), noise_percent=0.10)
    assert loaded.num_users == bundle.num_users


@pytest.mark.slow
def test_nan_guard_restores_checkpoint(tmp_path):
    """Failure detection: a non-finite epoch loss rolls back to the last
    checkpoint and training continues (SURVEY.md §5 gap, ours to fill)."""
    import jax.numpy as jnp
    from sagnn_tpu.config import Config, ModelConfig, TrainConfig

    cfg = Config(
        model=ModelConfig(graph_num=2, gnn_layer=1, att_layer=1, latdim=16,
                          num_heads=4, ssldim=8, pos_length=16,
                          keep_rate=1.0),
        train=TrainConfig(batch=8, samp_num=4, ssl_num=2, trn_num=16,
                          test_size=10, epoch=2, tst_epoch=1, lr=1e-3),
    )
    bundle = synthetic_dataset(num_users=32, num_items=48, graph_num=2,
                               test_size=10, seed=3)
    tr = Trainer(cfg, bundle, ckpt_root=str(tmp_path), pad_multiple=64)
    tr.ckpt.save(tr.state, tr.history)          # a known-good checkpoint
    # poison the params
    tr.state["params"]["reg"]["u_embed"] = (
        tr.state["params"]["reg"]["u_embed"] * jnp.nan)
    res = tr.run()
    assert np.isfinite(res["NDCG"])
    # params were restored (finite again)
    assert np.isfinite(
        np.asarray(tr.state["params"]["reg"]["u_embed"])).all()


def test_nan_guard_raises_without_checkpoint(tmp_path):
    import jax.numpy as jnp
    import pytest as _pytest
    from sagnn_tpu.config import Config, ModelConfig, TrainConfig

    cfg = Config(
        model=ModelConfig(graph_num=2, gnn_layer=1, att_layer=1, latdim=16,
                          num_heads=4, ssldim=8, pos_length=16,
                          keep_rate=1.0),
        train=TrainConfig(batch=8, samp_num=4, ssl_num=2, trn_num=16,
                          test_size=10, epoch=1, tst_epoch=1),
    )
    bundle = synthetic_dataset(num_users=32, num_items=48, graph_num=2,
                               test_size=10, seed=3)
    tr = Trainer(cfg, bundle, ckpt_root=str(tmp_path), pad_multiple=64)
    tr.state["params"]["reg"]["u_embed"] = (
        tr.state["params"]["reg"]["u_embed"] * jnp.nan)
    with _pytest.raises(FloatingPointError):
        tr.run()


def test_checkpoint_config_roundtrip(tmp_path):
    """config.json rides the checkpoint so inference tooling can rebuild
    the exact model (scripts/recommend.py)."""
    from sagnn_tpu.config import Config, ModelConfig, TrainConfig
    from sagnn_tpu.train.checkpoint import CheckpointManager

    cfg = Config(
        model=ModelConfig(graph_num=2, gnn_layer=1, att_layer=1, latdim=16,
                          num_heads=4, ssldim=8, pos_length=16,
                          keep_rate=1.0, spmm_backend="xla"),
        train=TrainConfig(batch=8, samp_num=4, ssl_num=2, trn_num=16,
                          test_size=10, epoch=1, tst_epoch=1),
    )
    bundle = synthetic_dataset(num_users=32, num_items=48, graph_num=2,
                               test_size=10, seed=3)
    tr = Trainer(cfg, bundle, ckpt_root=str(tmp_path), pad_multiple=64)
    tr.ckpt.save(tr.state, tr.history, cfg)
    loaded = CheckpointManager(str(tmp_path),
                               cfg.train.save_path).load_config()
    assert loaded == cfg


@pytest.mark.slow
def test_seed_reproducibility(tmp_path):
    """Same seed => bit-identical params after an epoch (the reference's
    seeded-run reproducibility contract, main.py:21-23)."""
    from sagnn_tpu.config import Config, ModelConfig, TrainConfig

    def run_once(sub):
        cfg = Config(
            model=ModelConfig(graph_num=2, gnn_layer=1, att_layer=1,
                              latdim=16, num_heads=4, ssldim=8,
                              pos_length=16, keep_rate=0.5),
            train=TrainConfig(batch=8, samp_num=4, ssl_num=2, trn_num=16,
                              test_size=10, seed=123),
        )
        bundle = synthetic_dataset(num_users=32, num_items=48, graph_num=2,
                                   test_size=10, seed=3)
        tr = Trainer(cfg, bundle, ckpt_root=str(tmp_path / sub),
                     pad_multiple=64)
        tr.train_epoch(verbose=False)
        return tr.state["params"]

    p1, p2 = run_once("a"), run_once("b")
    for l1, l2 in zip(jax.tree_util.tree_leaves(p1),
                      jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_time_budget_stops_at_epoch_boundary(bundle, tmp_path_factory):
    """--time_budget_h: with a budget any second epoch would overrun, the
    run stops cleanly after epoch 0 — history has exactly one Train entry
    and run() still returns (finalize + max line path)."""
    import dataclasses
    cfg = dataclasses.replace(
        CFG, train=dataclasses.replace(CFG.train, epoch=50,
                                       time_budget_h=1e-9))
    tr = Trainer(cfg, bundle,
                 ckpt_root=str(tmp_path_factory.mktemp("ck_budget")),
                 pad_multiple=64)
    out = tr.run()
    assert len(tr.history.data["TrainLoss"]) == 1
    assert "HR" in out and "NDCG" in out


def test_no_time_budget_runs_all_epochs(bundle, tmp_path_factory):
    tr = Trainer(CFG, bundle,
                 ckpt_root=str(tmp_path_factory.mktemp("ck_nobudget")),
                 pad_multiple=64)
    tr.run()
    assert len(tr.history.data["TrainLoss"]) == CFG.train.epoch
