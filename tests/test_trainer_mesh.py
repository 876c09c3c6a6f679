"""Trainer with an explicit mesh: end-to-end multi-device training."""

import jax
import numpy as np
import pytest

from sagnn_tpu.config import Config, ModelConfig, TrainConfig
from sagnn_tpu.data.synthetic import synthetic_dataset
from sagnn_tpu.parallel.mesh import make_mesh
from sagnn_tpu.train.trainer import Trainer

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
