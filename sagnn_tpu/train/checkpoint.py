"""Checkpoint / resume (ref: model.py:512-527 saveHistory/loadModel).

The reference saves a full tf.train.Saver checkpoint plus a pickled metrics
history, writing only when test NDCG improves (model.py:62-66), and resumes
both, deriving the restart epoch from history length (model.py:44-46).

Here: orbax sharded checkpoint of {params, opt_state, step} plus a JSON
metrics history sidecar, same best-NDCG save policy (enforced by Trainer).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from sagnn_tpu.train.metrics import MetricsHistory


class CheckpointManager:
    def __init__(self, root: str, save_path: str):
        self.dir = os.path.abspath(os.path.join(root, save_path))
        os.makedirs(self.dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    @property
    def _state_dir(self) -> str:
        return os.path.join(self.dir, "state")

    @property
    def _history_path(self) -> str:
        return os.path.join(self.dir, "history.json")

    @property
    def _config_path(self) -> str:
        return os.path.join(self.dir, "config.json")

    def save(self, state: Dict, history: MetricsHistory,
             config=None) -> None:
        """config: optional sagnn_tpu.config.Config persisted alongside the
        weights so inference tooling (scripts/recommend.py) can rebuild the
        exact model without the training command line."""
        state = jax.tree_util.tree_map(np.asarray, state)
        path = self._state_dir
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            import shutil
            shutil.rmtree(tmp)
        self._ckpt.save(tmp, state)
        self._ckpt.wait_until_finished()
        if os.path.exists(path):
            import shutil
            shutil.rmtree(path)
        os.rename(tmp, path)
        with open(self._history_path, "w") as f:
            json.dump(history.data, f)
        if config is not None:
            import dataclasses
            with open(self._config_path, "w") as f:
                json.dump(dataclasses.asdict(config), f, indent=1)

    def load_config(self):
        """Rebuild the Config saved alongside the checkpoint (or None)."""
        if not os.path.exists(self._config_path):
            return None
        from sagnn_tpu.config import (Config, DataConfig, ModelConfig,
                                      TrainConfig)
        with open(self._config_path) as f:
            d = json.load(f)
        return Config(model=ModelConfig(**d["model"]),
                      train=TrainConfig(**d["train"]),
                      data=DataConfig(**d["data"]))

    def restore(self, abstract_state: Dict
                ) -> Tuple[Optional[Dict], MetricsHistory]:
        if not os.path.exists(self._state_dir):
            return None, MetricsHistory()
        state = self._ckpt.restore(self._state_dir, abstract_state)
        hist = MetricsHistory()
        if os.path.exists(self._history_path):
            with open(self._history_path) as f:
                hist.data.update(json.load(f))
        return state, hist

    def resume_epoch(self, history: MetricsHistory, tst_epoch: int) -> int:
        """ref model.py:46: stloc = len(TrainLoss)*tstEpoch - (tstEpoch-1)."""
        n = len(history.data["TrainLoss"])
        return max(0, n * tst_epoch - (tst_epoch - 1))
