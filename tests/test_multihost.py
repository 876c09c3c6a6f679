"""Multi-PROCESS distributed SpMM: two jax.distributed processes joined by
the Gloo transport run the ring edge-partitioned SpMM on a shared graph
(the closest this image gets to a real N>=2-host pod run; the same worker
code path runs unchanged per host on TPU)."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.timeout(300)
def test_two_process_ring_spmm():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "bench_multihost.py"),
         "--procs", "2", "--local_devices", "1", "--edges", "60000",
         "--users", "4000", "--items", "3000", "--iters", "1"],
        capture_output=True, timeout=280, cwd=ROOT, env=env)
    assert out.returncode == 0, out.stderr.decode()[-2000:]
    line = [l for l in out.stdout.decode().splitlines()
            if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["processes"] == 2
    assert res["checksum_ok"] is True
