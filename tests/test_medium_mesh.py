"""Medium-shape (20k-user) multi-device pass — VERDICT r3 #5.

The driver dry-run and the other GSPMD tests exercise toy shapes
(128 users / 256 items) where most padding branches are degenerate. This
test runs the full sharded Trainer at 20,480 users x 16,384 items
(160 / 128 R=128 target blocks, ~100k edges per interval) on a 4x2
('data','model') CPU mesh, so the real branches fire at non-toy scale:

- R=128 block padding with hundreds of partially-filled blocks,
- 'model'-shard multiples of the node tables (20480/2, 16384/2),
- fold-gather's even-row constraint composed with TP sharding,
- source-shard windows (4096 rows -> 4/5 shards per direction) that do
  not divide the catalog evenly,
- ring bucket plans over a (2-way) model axis at realistic fill.

All three propagation backends must produce the IDENTICAL first-epoch
loss (same params from the same seed; propagation backends are
value-equivalent by design — the assert is exact-equality-grade 1e-6).
"""

import dataclasses

import numpy as np
import pytest

from sagnn_tpu.config import Config, ModelConfig, TrainConfig
from sagnn_tpu.data.synthetic import synthetic_large_dataset
from sagnn_tpu.parallel.mesh import make_mesh
from sagnn_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow

BASE = Config(
    model=ModelConfig(graph_num=2, gnn_layer=1, att_layer=1, latdim=16,
                      num_heads=4, ssldim=8, pos_length=16, keep_rate=1.0),
    train=TrainConfig(batch=64, samp_num=4, ssl_num=2, trn_num=64,
                      test_size=10, lr=5e-3),
)
VARIANTS = {
    "xla": {},
    "pallas_srcshard_fold": {"spmm_backend": "pallas",
                             "spmm_src_shard_rows": 4096,
                             "spmm_fold_gather": True},
    "ring": {"spmm_backend": "ring"},
}


def test_medium_shape_backends_match(tmp_path):
    bundle = synthetic_large_dataset(20_480, 16_384, 120_000, 2,
                                     test_size=10, num_test_users=64,
                                     seed=5)
    mesh = make_mesh(data=4, model=2)
    losses = {}
    for name, overrides in VARIANTS.items():
        cfg = dataclasses.replace(
            BASE, model=dataclasses.replace(BASE.model, **overrides))
        tr = Trainer(cfg, bundle, ckpt_root=str(tmp_path / name),
                     mesh=mesh)
        out = tr.train_epoch(verbose=False)
        assert np.isfinite(out["Loss"]), name
        losses[name] = out["preLoss"]
        del tr
    ref = losses["xla"]
    for name, loss in losses.items():
        np.testing.assert_allclose(loss, ref, rtol=1e-6, err_msg=name)
