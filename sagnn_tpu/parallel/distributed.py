"""Sharded training: place state/graphs/batches over a mesh and step under
GSPMD. Used by the multichip dry-run and multi-device training runs.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import optax

from sagnn_tpu.config import Config
from sagnn_tpu.models.selfgnn import SelfGNN, TrainBatch
from sagnn_tpu.parallel.sharding import (
    ShardingRules, batch_shardings, graph_shardings, opt_state_shardings,
    param_shardings,
)
from sagnn_tpu.train.trainer import make_train_step


def init_sharded_state(rules: ShardingRules, model: SelfGNN,
                       optimizer: optax.GradientTransformation,
                       key: jax.Array) -> Dict:
    """Init params directly into their target shardings (jit + out_shardings
    so the full tables never materialize replicated), then build the
    optimizer state from the sharded params (Adam moments inherit layouts)."""
    abstract = jax.eval_shape(model.init, key)
    p_sh = param_shardings(rules, abstract)
    params = jax.jit(model.init, out_shardings=p_sh)(key)
    # explicit out_shardings: moments mirror params, scalar counts
    # REPLICATED (a bare jit would commit them to one device, which breaks
    # cross-mesh checkpoint restore templates)
    o_sh = opt_state_shardings(rules, jax.eval_shape(optimizer.init, params),
                               p_sh)
    opt_state = jax.jit(optimizer.init, out_shardings=o_sh)(params)
    step = jax.device_put(jax.numpy.zeros((), jax.numpy.int32),
                          rules.replicated)
    return {"params": params, "opt_state": opt_state, "step": step}


def shard_inputs(rules: ShardingRules, graphs: Dict, batch: TrainBatch
                 ) -> Tuple[Dict, TrainBatch]:
    g_sh = graph_shardings(rules, graphs)
    b_sh = batch_shardings(rules, batch)
    graphs = {k: jax.device_put(v, g_sh[k]) for k, v in graphs.items()}
    batch = jax.tree_util.tree_map(jax.device_put, batch, b_sh)
    return graphs, batch


def make_sharded_train_step(rules: ShardingRules, model: SelfGNN,
                            optimizer: optax.GradientTransformation,
                            cfg: Config):
    """jit-compiled train step; input/output layouts follow the committed
    placements of the sharded state (GSPMD propagates and inserts
    collectives over the mesh)."""
    step = make_train_step(model, optimizer, cfg.train.reg,
                           cfg.train.ssl_reg)
    return jax.jit(step, donate_argnums=(0,))
