"""Edge-partitioned distributed SpMM tests (shard_map over the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sagnn_tpu.parallel.edge_partition import (
    edge_partitioned_propagate, edge_partitioned_spmm, pad_node_table,
    partition_edges_by_target,
)
from sagnn_tpu.parallel.mesh import make_mesh


def _graph(rng, U, I, E):
    tgt = np.sort(rng.integers(0, U, E, dtype=np.int32))
    src = rng.integers(0, I, E, dtype=np.int32)
    return src, tgt


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_partition_structure(n_shards):
    rng = np.random.default_rng(0)
    U, I, E = 1000, 800, 20000
    src, tgt = _graph(rng, U, I, E)
    parts = partition_edges_by_target(src, tgt, U, n_shards)
    assert parts.num_shards == n_shards
    rows = parts.rows_per_shard
    total = 0
    for p in range(n_shards):
        tl = parts.tgt_local[p]
        real = tl < rows
        total += int(real.sum())
        assert (np.diff(tl) >= 0).all()
        # local targets in range
        assert (tl[real] >= 0).all()
        # globally these edges belong to shard p's row range
        glob = tl[real] + p * rows
        assert (glob < U).all()
    assert total == E


@pytest.mark.parametrize("n_shards", [2, 8])
def test_distributed_spmm_matches_scipy(n_shards):
    rng = np.random.default_rng(1)
    U, I, D, E = 600, 500, 32, 9000
    src, tgt = _graph(rng, U, I, E)
    X = rng.standard_normal((I, D)).astype(np.float32)
    parts = partition_edges_by_target(src, tgt, U, n_shards)
    mesh = make_mesh(data=8 // n_shards, model=n_shards)
    Xp = pad_node_table(X, n_shards)
    x_dev = jax.device_put(
        jnp.asarray(Xp),
        jax.sharding.NamedSharding(mesh,
                                   jax.sharding.PartitionSpec("model",
                                                              None)))
    with mesh:
        out = edge_partitioned_spmm(mesh, x_dev, parts)
    expect = np.zeros((U, D), np.float32)
    np.add.at(expect, tgt, X[src])
    np.testing.assert_allclose(np.asarray(out)[:U], expect, rtol=1e-5,
                               atol=1e-4)


def test_distributed_grad_matches_transpose():
    rng = np.random.default_rng(2)
    U, I, D, E = 320, 240, 16, 4000
    src, tgt = _graph(rng, U, I, E)
    X = rng.standard_normal((I, D)).astype(np.float32)
    parts = partition_edges_by_target(src, tgt, U, 4)
    mesh = make_mesh(data=2, model=4)
    Xp = pad_node_table(X, 4)
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("model", None))
    x_dev = jax.device_put(jnp.asarray(Xp), sharding)

    G = rng.standard_normal((U, D)).astype(np.float32)

    def f(x):
        with mesh:
            out = edge_partitioned_propagate(mesh, x, parts, leaky=1.0)
        return jnp.sum(out * jnp.asarray(G))

    dx = jax.grad(f)(x_dev)
    import scipy.sparse as sp
    A = sp.coo_matrix((np.ones(E), (tgt, src)), shape=(U, I)).tocsr()
    expect = (A.T @ G).astype(np.float32)
    np.testing.assert_allclose(np.asarray(dx)[:I], expect, rtol=1e-4,
                               atol=1e-3)
