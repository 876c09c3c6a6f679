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


# ---------------------------------------------------------------------------
# Ring-overlapped variant
# ---------------------------------------------------------------------------

from sagnn_tpu.parallel.edge_partition import (  # noqa: E402
    pad_node_table_rows, partition_edges_ring, ring_edge_partitioned_spmm,
)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_ring_partition_structure(n_shards):
    rng = np.random.default_rng(10)
    U, I, E = 900, 700, 15000
    src, tgt = _graph(rng, U, I, E)
    parts = partition_edges_ring(src, tgt, I, U, n_shards)
    rows, srows = parts.rows_per_shard, parts.src_rows_per_shard
    total = 0
    for p in range(n_shards):
        for q in range(n_shards):
            tl = parts.tgt_local[p, q]
            sl = parts.src_local[p, q]
            real = tl < rows
            total += int(real.sum())
            assert (np.diff(tl) >= 0).all()          # sorted per bucket
            assert (sl[real] >= 0).all() and (sl[real] < srows).all()
            # bucket (p, q) holds edges whose global src is in shard q
            glob_s = sl[real] + q * srows
            glob_t = tl[real] + p * rows
            assert (glob_s < I).all() and (glob_t < U).all()
    assert total == E


@pytest.mark.parametrize("n_shards", [2, 8])
def test_ring_spmm_matches_scipy(n_shards):
    rng = np.random.default_rng(11)
    U, I, D, E = 600, 500, 32, 9000
    src, tgt = _graph(rng, U, I, E)
    X = rng.standard_normal((I, D)).astype(np.float32)
    parts = partition_edges_ring(src, tgt, I, U, n_shards)
    mesh = make_mesh(data=8 // n_shards, model=n_shards)
    Xp = pad_node_table_rows(X, n_shards, parts.src_rows_per_shard)
    x_dev = jax.device_put(
        jnp.asarray(Xp),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("model", None)))
    with mesh:
        out = ring_edge_partitioned_spmm(mesh, x_dev, parts)
    expect = np.zeros((U, D), np.float32)
    np.add.at(expect, tgt, X[src])
    np.testing.assert_allclose(np.asarray(out)[:U], expect, rtol=1e-5,
                               atol=1e-4)


def test_ring_spmm_grad_matches_reference():
    rng = np.random.default_rng(12)
    U, I, D, E = 320, 240, 16, 4000
    src, tgt = _graph(rng, U, I, E)
    X = rng.standard_normal((I, D)).astype(np.float32)
    G = rng.standard_normal((U, D)).astype(np.float32)
    parts = partition_edges_ring(src, tgt, I, U, 4)
    mesh = make_mesh(data=2, model=4)
    Xp = pad_node_table_rows(X, 4, parts.src_rows_per_shard)
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("model", None))
    x_dev = jax.device_put(jnp.asarray(Xp), sharding)

    def f(x):
        with mesh:
            out = ring_edge_partitioned_spmm(mesh, x, parts)
        return jnp.vdot(out[:U], jnp.asarray(G))

    gx = jax.grad(f)(x_dev)
    # reference grad: transpose SpMM of G
    expect = np.zeros_like(Xp)
    np.add.at(expect, src, G[tgt])
    np.testing.assert_allclose(np.asarray(gx), expect, rtol=1e-5, atol=1e-4)


def test_ring_matches_allgather_variant():
    rng = np.random.default_rng(13)
    U, I, D, E = 500, 400, 8, 6000
    src, tgt = _graph(rng, U, I, E)
    X = rng.standard_normal((I, D)).astype(np.float32)
    mesh = make_mesh(data=1, model=8)
    sh = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("model", None))

    ring = partition_edges_ring(src, tgt, I, U, 8)
    x_ring = jax.device_put(
        jnp.asarray(pad_node_table_rows(X, 8, ring.src_rows_per_shard)), sh)
    ag = partition_edges_by_target(src, tgt, U, 8)
    x_ag = jax.device_put(jnp.asarray(pad_node_table(X, 8)), sh)
    with mesh:
        out_r = ring_edge_partitioned_spmm(mesh, x_ring, ring)
        out_a = edge_partitioned_spmm(mesh, x_ag, ag)
    np.testing.assert_allclose(np.asarray(out_r)[:U], np.asarray(out_a)[:U],
                               rtol=1e-5, atol=1e-4)


def test_ring_model_backend_matches_xla():
    """Full-model propagation parity: spmm_backend='ring' over a 4-shard
    mesh vs the single-logical-device XLA path."""
    import dataclasses
    from sagnn_tpu.config import ModelConfig
    from sagnn_tpu.data.graph import compile_interval_graphs
    from sagnn_tpu.data.synthetic import synthetic_dataset
    from sagnn_tpu.models.selfgnn import SelfGNN, _interval_propagation
    from sagnn_tpu.parallel.edge_partition import (
        build_interval_ring_partitions)
    from sagnn_tpu.train.trainer import graphs_to_device

    bundle = synthetic_dataset(num_users=48, num_items=64, graph_num=2,
                               seed=21)
    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=8)
    graphs = graphs_to_device(gb)
    mesh = make_mesh(data=2, model=4)
    ring = build_interval_ring_partitions(gb, 4, pad_multiple=8)
    graphs["ring"] = {k: jnp.asarray(ring[k])
                      for k in ("u_src_local", "u_tgt_local",
                                "i_src_local", "i_tgt_local")}
    base = dict(graph_num=2, gnn_layer=2, latdim=16, num_heads=4, ssldim=8,
                pos_length=10)
    cfg_x = ModelConfig(**base)
    cfg_r = dataclasses.replace(cfg_x, spmm_backend="ring")
    params = SelfGNN(cfg_x, 48, 64).init(jax.random.PRNGKey(5))

    uv_x, iv_x = _interval_propagation(params, graphs, cfg_x, 48, 64)
    with mesh:
        uv_r, iv_r = _interval_propagation(params, graphs, cfg_r, 48, 64,
                                           mesh=mesh)
    np.testing.assert_allclose(np.asarray(uv_r), np.asarray(uv_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(iv_r), np.asarray(iv_x),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_ring_model_backend_grads_match():
    import dataclasses
    from sagnn_tpu.config import ModelConfig
    from sagnn_tpu.data.graph import compile_interval_graphs
    from sagnn_tpu.data.synthetic import synthetic_dataset
    from sagnn_tpu.models.selfgnn import SelfGNN, _interval_propagation
    from sagnn_tpu.parallel.edge_partition import (
        build_interval_ring_partitions)
    from sagnn_tpu.train.trainer import graphs_to_device

    bundle = synthetic_dataset(num_users=32, num_items=40, graph_num=2,
                               seed=22)
    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=8)
    graphs = graphs_to_device(gb)
    mesh = make_mesh(data=1, model=8)
    ring = build_interval_ring_partitions(gb, 8, pad_multiple=8)
    graphs["ring"] = {k: jnp.asarray(ring[k])
                      for k in ("u_src_local", "u_tgt_local",
                                "i_src_local", "i_tgt_local")}
    base = dict(graph_num=2, gnn_layer=2, latdim=16, num_heads=4, ssldim=8,
                pos_length=10)
    cfg_x = ModelConfig(**base)
    cfg_r = dataclasses.replace(cfg_x, spmm_backend="ring")
    params = SelfGNN(cfg_x, 32, 40).init(jax.random.PRNGKey(6))

    def loss(params, cfg, mesh_arg):
        uv, iv = _interval_propagation(params, graphs, cfg, 32, 40,
                                       mesh=mesh_arg)
        return jnp.sum(uv ** 2) + jnp.sum(iv ** 2)

    gx = jax.grad(lambda p: loss(p, cfg_x, None))(params)
    with mesh:
        gr = jax.grad(lambda p: loss(p, cfg_r, mesh))(params)
    np.testing.assert_allclose(np.asarray(gr["reg"]["u_embed"]),
                               np.asarray(gx["reg"]["u_embed"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gr["reg"]["i_embed"]),
                               np.asarray(gx["reg"]["i_embed"]),
                               rtol=1e-4, atol=1e-4)


def test_ring_weighted_spmm_matches_scipy():
    """Weighted ring hop: per-edge values ride the buckets (pad 0)."""
    rng = np.random.default_rng(14)
    U, I, D, E = 600, 500, 16, 9000
    src, tgt = _graph(rng, U, I, E)
    w = rng.standard_normal(E).astype(np.float32)
    X = rng.standard_normal((I, D)).astype(np.float32)
    parts = partition_edges_ring(src, tgt, I, U, 4, weights=w)
    mesh = make_mesh(data=2, model=4)
    Xp = pad_node_table_rows(X, 4, parts.src_rows_per_shard)
    x_dev = jax.device_put(
        jnp.asarray(Xp),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("model", None)))
    with mesh:
        out = ring_edge_partitioned_spmm(mesh, x_dev, parts)
    expect = np.zeros((U, D), np.float32)
    np.add.at(expect, tgt, w[:, None] * X[src])
    np.testing.assert_allclose(np.asarray(out)[:U], expect, rtol=1e-4,
                               atol=1e-4)


def test_ring_model_backend_edge_norm_matches_xla():
    """Full-model normalized propagation on the ring backend matches the
    XLA weighted path (edge_norm now supported on every backend)."""
    import dataclasses
    from sagnn_tpu.config import ModelConfig
    from sagnn_tpu.data.graph import compile_interval_graphs, edge_weights
    from sagnn_tpu.data.synthetic import synthetic_dataset
    from sagnn_tpu.models.selfgnn import SelfGNN, _interval_propagation
    from sagnn_tpu.parallel.edge_partition import (
        build_interval_ring_partitions)
    from sagnn_tpu.train.trainer import graphs_to_device

    bundle = synthetic_dataset(num_users=48, num_items=64, graph_num=2,
                               seed=23)
    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=8)
    graphs = graphs_to_device(gb)
    mesh = make_mesh(data=2, model=4)
    for norm in ("sym_sqrt", "mean"):
        ew = edge_weights(gb, bundle.sub_mats, norm=norm)
        graphs["edge_weights"] = jnp.asarray(ew)
        ring = build_interval_ring_partitions(gb, 4, pad_multiple=8,
                                              weights=ew)
        graphs["ring"] = {k: jnp.asarray(ring[k])
                          for k in ("u_src_local", "u_tgt_local",
                                    "i_src_local", "i_tgt_local",
                                    "u_weights", "i_weights")}
        base = dict(graph_num=2, gnn_layer=2, latdim=16, num_heads=4,
                    ssldim=8, pos_length=10, edge_norm=norm)
        cfg_x = ModelConfig(**base)
        cfg_r = dataclasses.replace(cfg_x, spmm_backend="ring")
        params = SelfGNN(cfg_x, 48, 64).init(jax.random.PRNGKey(7))

        uv_x, iv_x = _interval_propagation(params, graphs, cfg_x, 48, 64)
        with mesh:
            uv_r, iv_r = _interval_propagation(params, graphs, cfg_r,
                                               48, 64, mesh=mesh)
        np.testing.assert_allclose(np.asarray(uv_r), np.asarray(uv_x),
                                   rtol=1e-5, atol=1e-5, err_msg=norm)
        np.testing.assert_allclose(np.asarray(iv_r), np.asarray(iv_x),
                                   rtol=1e-5, atol=1e-5, err_msg=norm)


@pytest.mark.slow
def test_ring_pallas_spmm_matches_scipy_and_grads():
    """Pallas-kernel ring hop (ring_spmm_pallas): forward matches scipy,
    gradient matches the transpose SpMM via the paired custom VJP —
    unweighted and symmetric-weighted."""
    from sagnn_tpu.parallel.edge_partition import (
        build_ring_bucket_plans, partition_edges_ring, ring_spmm_pallas)
    from sagnn_tpu.ops.spmm_pallas import R as _R

    rng = np.random.default_rng(13)
    U, I, D, E, P_ = 600, 500, 32, 9000, 4
    src, tgt = _graph(rng, U, I, E)
    X = rng.standard_normal((I, D)).astype(np.float32)
    G = rng.standard_normal((U, D)).astype(np.float32)
    for weighted in (False, True):
        w = (rng.random(E).astype(np.float32) + 0.25) if weighted else None
        # transpose edge list, sorted by its target (= src)
        o = np.argsort(src, kind="stable")
        bsrc, btgt = tgt[o], src[o]
        bw = w[o] if weighted else None
        fparts = partition_edges_ring(src, tgt, I, U, P_, weights=w)
        bparts = partition_edges_ring(bsrc, btgt, U, I, P_, weights=bw)
        fplan = build_ring_bucket_plans(fparts)
        bplan = build_ring_bucket_plans(bparts)
        nb_f, nb_i = fplan.pop("num_blocks"), bplan.pop("num_blocks")
        keys = ["src", "tgt_local", "chunk_block", "chunk_first"]
        if weighted:
            keys.append("weights")
        fa = tuple(jnp.asarray(fplan[k]) for k in keys)
        ba = tuple(jnp.asarray(bplan[k]) for k in keys)
        rows_f, rows_b = fparts.rows_per_shard, bparts.rows_per_shard
        mesh = make_mesh(data=2, model=P_)
        Xp = pad_node_table_rows(X, P_, fparts.src_rows_per_shard)
        sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("model", None))
        x_dev = jax.device_put(jnp.asarray(Xp), sharding)

        with mesh:
            out = ring_spmm_pallas(mesh, x_dev, fa, ba, rows_f, nb_f,
                                   rows_b, nb_i, "model")
        expect = np.zeros((U, D), np.float32)
        np.add.at(expect, tgt, X[src] * (w[:, None] if weighted else 1.0))
        np.testing.assert_allclose(np.asarray(out)[:U], expect, rtol=1e-4,
                                   atol=1e-4)

        def f(x):
            with mesh:
                o_ = ring_spmm_pallas(mesh, x, fa, ba, rows_f, nb_f,
                                      rows_b, nb_i, "model")
            return jnp.vdot(o_[:U], jnp.asarray(G))

        gx = jax.grad(f)(x_dev)
        gexp = np.zeros_like(Xp)
        np.add.at(gexp, src, G[tgt] * (w[:, None] if weighted else 1.0))
        np.testing.assert_allclose(np.asarray(gx), gexp, rtol=1e-4,
                                   atol=1e-4)


def test_ring_chunk_size_considers_all_intervals():
    """choose_ring_chunk_size must weigh EVERY interval's bucket histogram:
    a tiny interval 0 followed by dense intervals (the yelp skew) must not
    pin the stacked width to interval 0's choice (VERDICT r2 weak #5)."""
    from sagnn_tpu.parallel.edge_partition import (
        _ring_chunk_cost, build_ring_bucket_plans, choose_ring_chunk_size,
        partition_edges_ring, stack_ring_bucket_plans)

    rng = np.random.default_rng(0)
    U, I, P_ = 1024, 768, 4

    def parts_for(E):
        tgt = np.sort(rng.integers(0, U, E, dtype=np.int32))
        src = rng.integers(0, I, E, dtype=np.int32)
        return partition_edges_ring(src, tgt, I, U, P_)

    sparse = parts_for(300)          # favors small chunks
    dense = parts_for(120_000)       # favors large chunks
    cs_sparse = choose_ring_chunk_size([sparse])
    cs_dense = choose_ring_chunk_size([dense])
    assert cs_sparse < cs_dense      # the skew is real in this fixture
    parts_list = [sparse, dense, dense, dense]
    cs_all = choose_ring_chunk_size(parts_list)
    # summed cost: the three dense intervals dominate interval 0
    assert cs_all == cs_dense
    want = sum(_ring_chunk_cost(p, cs_all) for p in parts_list)
    got_old = sum(_ring_chunk_cost(p, cs_sparse) for p in parts_list)
    assert want < got_old            # measured slot-cost win vs old policy
    # and the stacked plans actually carry that width
    st = stack_ring_bucket_plans(parts_list)
    assert st["tgt_local"].shape[-1] == cs_all
    # per-interval chunk COUNTS still adapt (sparse interval strips pads)
    pl_sparse = build_ring_bucket_plans(sparse, chunk_size=cs_all)
    pl_dense = build_ring_bucket_plans(dense, chunk_size=cs_all)
    assert pl_sparse["chunk_block"].shape[-1] < pl_dense[
        "chunk_block"].shape[-1]
