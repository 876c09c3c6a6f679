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
import orbax.checkpoint as ocp

from sagnn_tpu.train.metrics import MetricsHistory


class CheckpointManager:
    def __init__(self, root: str, save_path: str):
        self.dir = os.path.abspath(os.path.join(root, save_path))
        os.makedirs(self.dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        # (history, config) of an uncommitted async save; see save(block=)
        self._pending = None

    @property
    def _state_dir(self) -> str:
        return os.path.join(self.dir, "state")

    @property
    def _history_path(self) -> str:
        return os.path.join(self.dir, "history.json")

    @property
    def _config_path(self) -> str:
        return os.path.join(self.dir, "config.json")

    @property
    def _rng_path(self) -> str:
        return os.path.join(self.dir, "rng.json")

    def save(self, state: Dict, history: MetricsHistory,
             config=None, block: bool = True,
             rng_state: Optional[Dict] = None) -> None:
        """config: optional sagnn_tpu.config.Config persisted alongside the
        weights so inference tooling (scripts/recommend.py) can rebuild the
        exact model without the training command line.

        Sharded arrays are saved AS-IS: orbax writes each process's local
        shards directly, so a TP/DP-sharded state never gathers through one
        host's memory (the round-1 np.asarray gather forced full replication
        and broke exactly when multi-process training landed). Restoring
        onto a different mesh shape works because restore() takes the target
        state's shardings as the template (see restore).

        rng_state: optional JSON-able dict of host RNG state (sampler
        bit-generator state, trainer PRNG key, next epoch — see
        Trainer.capture_rng_state) committed alongside the weights so a
        resumed run replays the exact trajectory of an uninterrupted one
        (the reference loses all RNG state on resume, model.py:522-527).

        block=False returns as soon as the device arrays are staged to host
        (orbax's async writer); the tmp->final rename and history/config
        sidecars commit at the next save()/restore()/finalize() call, so
        training overlaps the disk write (matters at multi-GB state sizes).
        The previous committed checkpoint stays intact until then. In
        multi-process runs save/finalize are collective — call them in
        lockstep (the Trainer does)."""
        import shutil
        self.finalize()                      # commit any in-flight save
        tmp = self._state_dir + ".tmp"
        multiproc = jax.process_count() > 1
        if jax.process_index() == 0 and os.path.exists(tmp):
            shutil.rmtree(tmp)
        if multiproc:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("ckpt_tmp_clear")
        self._ckpt.save(tmp, state)          # collective when multi-process
        # snapshot the sidecars now: the trainer keeps appending to history
        self._pending = ({k: list(v) for k, v in history.data.items()},
                         config, rng_state)
        if block:
            self.finalize()

    def finalize(self) -> None:
        """Commit an uncommitted async save (no-op otherwise): wait for the
        writer, atomically rename tmp -> state, write the sidecars."""
        if self._pending is None:
            return
        import shutil
        history_data, config, rng_state = self._pending
        self._pending = None
        path = self._state_dir
        tmp = path + ".tmp"
        multiproc = jax.process_count() > 1
        self._ckpt.wait_until_finished()
        if multiproc:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("ckpt_written")
        if jax.process_index() == 0:
            if os.path.exists(path):
                shutil.rmtree(path)
            os.rename(tmp, path)
            with open(self._history_path, "w") as f:
                json.dump(history_data, f)
            if config is not None:
                import dataclasses
                with open(self._config_path, "w") as f:
                    json.dump(dataclasses.asdict(config), f, indent=1)
            if rng_state is not None:
                with open(self._rng_path, "w") as f:
                    json.dump(rng_state, f)
        if multiproc:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("ckpt_committed")

    def load_rng(self) -> Optional[Dict]:
        """The committed host-RNG sidecar of the last save (or None for
        checkpoints predating trajectory-exact resume)."""
        self.finalize()
        if not os.path.exists(self._rng_path):
            return None
        with open(self._rng_path) as f:
            return json.load(f)

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
        """abstract_state: a state pytree (concrete or abstract) whose
        shapes/dtypes/SHARDINGS are the restore targets — restoring onto a
        different mesh than the save reshards on load."""
        self.finalize()                      # a pending save must be visible
        if not os.path.exists(self._state_dir):
            return None, MetricsHistory()

        def as_abstract(x):
            sh = getattr(x, "sharding", None)
            return jax.ShapeDtypeStruct(jnp_shape(x), x.dtype, sharding=sh)

        def jnp_shape(x):
            return getattr(x, "shape", ())

        template = jax.tree_util.tree_map(as_abstract, abstract_state)
        state = self._ckpt.restore(self._state_dir, template)
        hist = MetricsHistory()
        if os.path.exists(self._history_path):
            with open(self._history_path) as f:
                hist.data.update(json.load(f))
        return state, hist

    def resume_epoch(self, history: MetricsHistory, tst_epoch: int) -> int:
        """ref model.py:46: stloc = len(TrainLoss)*tstEpoch - (tstEpoch-1)."""
        n = len(history.data["TrainLoss"])
        return max(0, n * tst_epoch - (tst_epoch - 1))
