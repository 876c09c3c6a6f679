"""Device mesh construction.

The reference is strictly single-GPU (SURVEY.md §2.2: no NCCL/MPI/horovod,
CUDA_VISIBLE_DEVICES=0). sagnn_tpu scales via `jax.sharding.Mesh` + GSPMD:
axes 'data' (batch/data parallel) × 'model' (node-table/tensor parallel).
Collectives are inserted by XLA and ride ICI within a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    Defaults: all devices on the data axis. `jax.distributed.initialize`
    (multi-host) should be called by the launcher before this.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))
