"""Multi-device sharding tests on the 8-device CPU mesh (conftest forces
XLA_FLAGS=--xla_force_host_platform_device_count=8).

Checks (SURVEY.md §4c): the sharded train step compiles, executes, and
matches the single-device step numerically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sagnn_tpu.config import Config, ModelConfig, TrainConfig
from sagnn_tpu.data.graph import compile_interval_graphs
from sagnn_tpu.data.sampler import Sampler
from sagnn_tpu.data.synthetic import synthetic_dataset
from sagnn_tpu.models.selfgnn import SelfGNN
from sagnn_tpu.parallel.distributed import (
    init_sharded_state, make_sharded_train_step, shard_inputs,
)
from sagnn_tpu.parallel.mesh import make_mesh
from sagnn_tpu.parallel.sharding import ShardingRules, param_shardings
from sagnn_tpu.train.trainer import graphs_to_device, make_optimizer, \
    make_train_step

CFG = Config(
    model=ModelConfig(graph_num=2, gnn_layer=1, att_layer=1, latdim=16,
                      num_heads=4, ssldim=8, pos_length=16, keep_rate=1.0),
    train=TrainConfig(batch=16, samp_num=4, ssl_num=2, trn_num=32,
                      test_size=10),
)


@pytest.fixture(scope="module")
def setup():
    bundle = synthetic_dataset(num_users=64, num_items=96, graph_num=2,
                               test_size=10, seed=1)
    model = SelfGNN(CFG.model, bundle.num_users, bundle.num_items)
    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=64)
    graphs = graphs_to_device(gb)
    sampler = Sampler(bundle=bundle, batch=16, samp_num=4, ssl_num=2,
                      pred_num=5, pos_length=16, test_size=10, seed=3,
                      backend="numpy")
    batch = sampler.train_batch(sampler.epoch_user_ids(16))
    return bundle, model, graphs, batch


def test_mesh_shapes():
    m = make_mesh()
    assert m.devices.size == 8
    m2 = make_mesh(data=4, model=2)
    assert dict(zip(m2.axis_names, m2.devices.shape)) == {
        "data": 4, "model": 2}


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
@pytest.mark.slow
def test_sharded_step_matches_single_device(setup, shape):
    bundle, model, graphs, batch = setup
    optimizer = make_optimizer(CFG)
    step = make_train_step(model, optimizer, CFG.train.reg,
                           CFG.train.ssl_reg)

    # single device reference
    params = model.init(jax.random.PRNGKey(0))
    state0 = {"params": params, "opt_state": optimizer.init(params),
              "step": jnp.zeros((), jnp.int32)}
    rng = jax.random.PRNGKey(7)
    state1, stats1 = jax.jit(step)(state0, graphs, batch, rng)

    # sharded
    # compare raw gradients (post-Adam params amplify reduction-order noise
    # on near-zero grads to a full step size, so they aren't comparable)
    from sagnn_tpu.models.selfgnn import reg_loss as _rl

    def loss_fn(params, graphs):
        pre, ssl, _ = model.train_losses(params, graphs, batch, None)
        return pre + CFG.train.reg * _rl(params) + CFG.train.ssl_reg * ssl

    g_single = jax.jit(jax.grad(loss_fn))(params, graphs)

    mesh = make_mesh(data=shape[0], model=shape[1])
    rules = ShardingRules(mesh)
    with mesh:
        sh_state = init_sharded_state(rules, model, optimizer,
                                      jax.random.PRNGKey(0))
        g2, b2 = shard_inputs(rules, graphs, batch)
        # grads BEFORE the step: the step donates sh_state
        g_shard = jax.jit(jax.grad(loss_fn))(sh_state["params"], g2)
        sh_step = make_sharded_train_step(rules, model, optimizer, CFG)
        state2, stats2 = sh_step(sh_state, g2, b2, rng)
        jax.block_until_ready(stats2)

    np.testing.assert_allclose(float(stats1["loss"]), float(stats2["loss"]),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_shard)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_param_shardings_cover_tables(setup):
    bundle, model, _, _ = setup
    mesh = make_mesh(data=4, model=2)
    rules = ShardingRules(mesh)
    abstract = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    sh = param_shardings(rules, abstract)
    spec_u = sh["reg"]["u_embed"].spec
    assert spec_u == jax.sharding.PartitionSpec(None, "model", None)
    assert sh["reg"]["meta2_w"].spec == jax.sharding.PartitionSpec()


@pytest.mark.slow
def test_dryrun_entrypoints():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))
    ge.dryrun_multichip(8)


def test_ring_attention_matches_dense():
    """Ring attention over a 4-device 'model' axis reproduces the dense
    stable-softmax MHSA (values AND grads) on sharded sequences."""
    from sagnn_tpu.ops.attention import (init_mhsa_params,
                                         multi_head_self_attention)
    from sagnn_tpu.parallel.ring_attention import (
        ring_multi_head_self_attention)

    mesh = make_mesh(data=2, model=4)
    B, L, D, H = 6, 16, 32, 4
    key = jax.random.PRNGKey(0)
    params = init_mhsa_params(key, D)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, L, D), jnp.float32)
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (B, L)) > 0.3
            ).astype(jnp.float32)
    mask = mask.at[:, 0].set(1.0)  # at least one valid key per row
    g = jax.random.normal(jax.random.PRNGKey(3), (B, L, D), jnp.float32)

    dense = multi_head_self_attention(params, x, H, stable=True, mask=mask)
    with mesh:
        ring = jax.jit(lambda p, xx: ring_multi_head_self_attention(
            mesh, p, xx, H, mask))(params, x)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)

    d_dense = jax.grad(lambda p, xx: jnp.vdot(multi_head_self_attention(
        p, xx, H, stable=True, mask=mask), g), argnums=(0, 1))(params, x)
    with mesh:
        d_ring = jax.jit(jax.grad(
            lambda p, xx: jnp.vdot(ring_multi_head_self_attention(
                mesh, p, xx, H, mask), g), argnums=(0, 1)))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(d_ring),
                    jax.tree_util.tree_leaves(d_dense)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


def test_seq_parallel_sequence_branch_matches_single(setup):
    """The model's per-token sequence branch with seq_parallel=True equals
    the single-device per-token branch on identical params."""
    import dataclasses

    from sagnn_tpu.models.selfgnn import _sequence_branch

    bundle, _, _, batch = setup
    mesh = make_mesh(data=2, model=4)
    cfg_pt = dataclasses.replace(CFG.model, per_token_seq_attention=True)
    cfg_sp = dataclasses.replace(cfg_pt, seq_parallel=True)
    model = SelfGNN(cfg_pt, bundle.num_users, bundle.num_items)
    params = model.init(jax.random.PRNGKey(5))
    item_emb = jax.random.normal(jax.random.PRNGKey(6),
                                 (bundle.num_items, CFG.model.latdim))

    single = _sequence_branch(params, item_emb, batch.seq, batch.seq_mask,
                              cfg_pt)
    with mesh:
        sharded = jax.jit(lambda p, e: _sequence_branch(
            p, e, batch.seq, batch.seq_mask, cfg_sp, mesh=mesh))(
                params, item_emb)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shape", [(8, 1), (4, 2)])
def test_fold_gather_sharded_matches(setup, shape):
    """spmm_fold_gather under GSPMD: the [N, D] -> [N/2, 2D] fold reshape
    must compose with 'model'-sharded node tables (row shards stay
    2-divisible) and match the single-device unfolded encode."""
    import dataclasses

    bundle, _, graphs, batch = setup
    from sagnn_tpu.data.graph import compile_interval_graphs
    from sagnn_tpu.ops.spmm_pallas import build_stacked_plans

    gb = compile_interval_graphs(bundle.sub_mats, pad_multiple=64)
    plans = build_stacked_plans(gb.u_src, gb.u_tgt, gb.i_src, gb.i_tgt,
                                gb.num_users, gb.num_items, gb.edge_counts)
    graphs2 = dict(graphs)
    graphs2["plans"] = {d: {k: jnp.asarray(v) for k, v in plans[d].items()}
                        for d in ("u", "i")}
    cfg_f = dataclasses.replace(CFG.model, spmm_backend="pallas",
                                spmm_fold_gather=True)
    cfg_p = dataclasses.replace(CFG.model, spmm_backend="pallas")
    model_f = SelfGNN(cfg_f, bundle.num_users, bundle.num_items)
    model_p = SelfGNN(cfg_p, bundle.num_users, bundle.num_items)
    params = model_f.init(jax.random.PRNGKey(0))

    fu_ref, fi_ref, _, _ = jax.jit(
        lambda p, g: model_p.encode(p, g))(params, graphs2)

    mesh = make_mesh(data=shape[0], model=shape[1])
    rules = ShardingRules(mesh)
    with mesh:
        p_sh = jax.device_put(params, param_shardings(rules, params))
        g_sh, _ = shard_inputs(rules, graphs2, batch)
        fu, fi, _, _ = jax.jit(
            lambda p, g: model_f.encode(p, g))(p_sh, g_sh)
        jax.block_until_ready(fu)
    np.testing.assert_allclose(np.asarray(fu), np.asarray(fu_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fi), np.asarray(fi_ref),
                               rtol=1e-5, atol=1e-5)
