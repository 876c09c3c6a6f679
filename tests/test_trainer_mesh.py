"""Trainer with an explicit mesh: end-to-end multi-device training."""

import jax
import numpy as np
import pytest

from sagnn_tpu.config import Config, ModelConfig, TrainConfig
from sagnn_tpu.data.synthetic import synthetic_dataset
from sagnn_tpu.parallel.mesh import make_mesh
from sagnn_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow

CFG = Config(
    model=ModelConfig(graph_num=2, gnn_layer=1, att_layer=1, latdim=16,
                      num_heads=4, ssldim=8, pos_length=16, keep_rate=1.0),
    train=TrainConfig(batch=16, samp_num=4, ssl_num=2, trn_num=32,
                      test_size=10, lr=5e-3),
)


@pytest.mark.parametrize("shape", [(8, 1), (4, 2)])
def test_mesh_trainer_trains_and_evals(tmp_path, shape):
    bundle = synthetic_dataset(num_users=48, num_items=64, graph_num=2,
                               test_size=10, seed=2)
    mesh = make_mesh(data=shape[0], model=shape[1])
    tr = Trainer(CFG, bundle, ckpt_root=str(tmp_path), pad_multiple=64,
                 mesh=mesh)
    # param tables actually sharded over 'model'
    sh = tr.state["params"]["reg"]["u_embed"].sharding
    assert sh.spec == jax.sharding.PartitionSpec(None, "model", None)
    first = tr.train_epoch(verbose=False)
    for _ in range(3):
        last = tr.train_epoch(verbose=False)
    assert last["preLoss"] < first["preLoss"]
    mets = tr.test_epoch()
    assert 0.0 <= mets["HR"] <= 1.0


@pytest.mark.parametrize("edge_norm", [None, "mean"])
def test_mesh_trainer_ring_backend(tmp_path, edge_norm):
    """Full Trainer with spmm_backend='ring': explicitly edge-partitioned
    propagation inside the sharded train step, loss decreases. edge_norm
    exercises the weighted (bucketed per-edge weights) ring path."""
    import dataclasses
    bundle = synthetic_dataset(num_users=48, num_items=64, graph_num=2,
                               test_size=10, seed=2)
    mesh = make_mesh(data=2, model=4)
    cfg = dataclasses.replace(
        CFG, model=dataclasses.replace(CFG.model, spmm_backend="ring",
                                       edge_norm=edge_norm))
    if edge_norm == "mean":
        # mean aggregation shrinks activation magnitudes: the tiny test run
        # needs a larger lr to show descent within a few epochs
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, lr=2e-2))
    tr = Trainer(cfg, bundle, ckpt_root=str(tmp_path), pad_multiple=64,
                 mesh=mesh)
    first = tr.train_epoch(verbose=False)
    for _ in range(3):
        last = tr.train_epoch(verbose=False)
    assert last["preLoss"] < first["preLoss"]
    mets = tr.test_epoch()
    assert 0.0 <= mets["HR"] <= 1.0


def test_mesh_load_imported_params(tmp_path):
    """Trainer.load_imported_params on a mesh: imported host arrays land in
    the TP shardings (node tables split over 'model'), Adam moments and the
    schedule count carry the imported step, and the sharded step consumes
    the state (distinct count buffers — the step donates its state)."""
    bundle = synthetic_dataset(num_users=48, num_items=64, graph_num=2,
                               test_size=10, seed=2)
    mesh = make_mesh(data=4, model=2)
    tr = Trainer(CFG, bundle, ckpt_root=str(tmp_path), pad_multiple=64,
                 mesh=mesh)
    rng = np.random.default_rng(0)
    host = jax.tree_util.tree_map(
        lambda a: rng.standard_normal(a.shape).astype(np.float32),
        jax.tree_util.tree_map(np.asarray, tr.state["params"]))
    mu = jax.tree_util.tree_map(lambda a: 0.1 * a, host)
    nu = jax.tree_util.tree_map(lambda a: np.abs(a) + 0.5, host)
    tr.load_imported_params(host, mu=mu, nu=nu, step=11)
    sh = tr.state["params"]["reg"]["u_embed"].sharding
    assert sh.spec == jax.sharding.PartitionSpec(None, "model", None)
    adam = tr.state["opt_state"][0]
    assert int(adam.count) == 11
    assert adam.mu["reg"]["u_embed"].sharding.spec == sh.spec
    np.testing.assert_array_equal(
        np.asarray(tr.state["params"]["reg"]["u_embed"]),
        host["reg"]["u_embed"])
    tr.train_epoch(verbose=False)
    assert int(tr.state["step"]) == 11 + CFG.train.trn_num // CFG.train.batch


def test_checkpoint_cross_mesh_restore(tmp_path):
    """Distributed-safe checkpointing: a state saved from a 4x2 mesh (TP
    over 'model'=2) restores onto an 8x1 mesh (different shardings) without
    a host gather — orbax reshards against the restore template. The
    restored trainer must produce the identical eval metrics and keep
    training."""
    bundle = synthetic_dataset(num_users=48, num_items=64, graph_num=2,
                               test_size=10, seed=2)
    tr_a = Trainer(CFG, bundle, ckpt_root=str(tmp_path), pad_multiple=64,
                   mesh=make_mesh(data=4, model=2))
    tr_a.train_epoch(verbose=False)
    mets_a = tr_a.test_epoch()
    tr_a.ckpt.save(tr_a.state, tr_a.history, tr_a.cfg)
    # saved WITHOUT replicating through host memory: every param leaf in
    # the save call is still a sharded jax.Array
    assert all(hasattr(l, "sharding")
               for l in jax.tree_util.tree_leaves(tr_a.state["params"]))

    tr_b = Trainer(CFG, bundle, ckpt_root=str(tmp_path), pad_multiple=64,
                   mesh=make_mesh(data=8, model=1))
    state, hist = tr_b.ckpt.restore(tr_b.state)
    assert state is not None
    tr_b.state = state
    # restored leaves carry the NEW mesh's shardings
    sh = tr_b.state["params"]["reg"]["u_embed"].sharding
    assert sh.mesh.shape["model"] == 1
    np.testing.assert_allclose(
        np.asarray(tr_a.state["params"]["reg"]["u_embed"]),
        np.asarray(tr_b.state["params"]["reg"]["u_embed"]))
    mets_b = tr_b.test_epoch()
    assert mets_b["NDCG"] == pytest.approx(mets_a["NDCG"], rel=1e-5)
    out = tr_b.train_epoch(verbose=False)
    assert np.isfinite(out["Loss"])
