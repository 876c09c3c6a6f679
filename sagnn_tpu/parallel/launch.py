"""Multi-host launch helpers.

The reference is single-process (SURVEY.md §1: the only device placement is
CUDA_VISIBLE_DEVICES=0). sagnn_tpu scales across hosts with
`jax.distributed.initialize` + a global mesh; this module wraps the
boilerplate so a pod-slice launch is:

    from sagnn_tpu.parallel.launch import initialize_distributed, global_mesh
    initialize_distributed()          # no-op on single host / TPU auto-detect
    mesh = global_mesh(model=4)       # ('data', 'model') over ALL devices

Per-host data sharding: each host samples only the batch rows its devices
own (`host_batch_slice`), so the host hot loop scales with hosts too.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

from sagnn_tpu.parallel.mesh import make_mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-host.

    With no arguments, relies on TPU auto-detection (GCE metadata); returns
    False (no-op) when the environment is clearly single-process and no
    coordinator is configured.
    """
    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and jax.distributed.is_initialized():
        return True
    explicit = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    auto_tpu = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi = auto_tpu and "," in auto_tpu
    if not explicit and not multi:
        return False
    jax.distributed.initialize(
        coordinator_address=explicit,
        num_processes=num_processes,
        process_id=process_id)
    return True


def global_mesh(model: int = 1):
    """('data', 'model') mesh over every device in the job (all hosts)."""
    return make_mesh(model=model)


def host_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(start, size) of this host's slice of a globally-sharded batch axis.

    Assumes the batch axis is sharded over 'data' across processes in
    process-id order (the default device order of make_mesh).
    """
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    assert global_batch % n == 0, (global_batch, n)
    return i * per, per
