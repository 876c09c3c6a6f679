"""Sharding rules: how params, graphs, and batches lay out over the mesh.

Round-1 strategy (GSPMD; SURVEY.md §2.2 table):
  * DP  — all per-pair/per-user batch arrays shard their leading sample axis
          over 'data'.
  * TP  — the big node-state tables (u_embed [g, U, D], i_embed [g, I, D])
          shard the NODE axis over 'model'; every full-graph intermediate
          ([U, g, D] LSTM/MHSA states) inherits that layout, so the
          LSTM/attention fusion is embarrassingly parallel over nodes.
  * Graph edge arrays [g, E] shard E over 'model' so each shard owns an edge
          slice; XLA turns the segment-sum into partial sums + psum.
  * PP/EP — not applicable to this model family (shallow, no MoE); SP is
          moot because the sequence branch pools to one token (Q3).

All rules are expressed as NamedShardings consumed by jit in_shardings /
device_put; XLA inserts the collectives.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class ShardingRules:
    mesh: Mesh
    data_axis: str = "data"
    model_axis: str = "model"

    def named(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


def param_shardings(rules: ShardingRules, params: Dict) -> Dict:
    """Pytree of NamedShardings matching init_params' structure."""
    m = rules.model_axis
    rep = rules.replicated

    def assign(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        # node-axis sharding for the two big tables
        if name in ("u_embed", "i_embed"):
            return rules.named(None, m, None)
        return rep

    return jax.tree_util.tree_map_with_path(assign, params)


def graph_shardings(rules: ShardingRules, graphs: Dict) -> Dict:
    """[g, E] edge arrays: shard the edge axis over 'model'.

    edge_weights is [2, g, E] (direction-major) — same edge-axis sharding,
    one axis deeper. "ring" holds [g, P, P, B] per-shard bucket arrays whose
    TARGET-shard axis (1) must align with the ring's mesh axis."""
    s = rules.named(None, rules.model_axis)
    s3 = rules.named(None, None, rules.model_axis)
    out = {}
    for k in graphs:
        if k in ("plans", "plans_ss"):
            # chunk schedules are not shardable along the edge axis
            # without replanning -> replicated
            out[k] = jax.tree_util.tree_map(
                lambda a: rules.replicated, graphs[k])
        elif k == "ring":
            # per-leaf: ring buckets are [g, P, ...] and the pallas plan
            # arrays are [g, P, P, NC(, C)] — axis 1 is always the
            # target-shard axis riding 'model'
            out[k] = jax.tree_util.tree_map(
                lambda a: rules.named(
                    *((None, rules.model_axis) + (None,) * (a.ndim - 2))),
                graphs[k])
        else:
            out[k] = (s3 if k in ("edge_weights", "edge_weights_canon")
                      else s)
    return out


def batch_shardings(rules: ShardingRules, batch) -> object:
    """TrainBatch: shard each leading sample axis over 'data'.

    [P] pair arrays -> P('data'); [B, L] sequences -> P('data', None);
    [g, Pssl] ssl arrays -> P(None, 'data').
    """
    d = rules.data_axis

    def assign(leaf):
        if leaf.ndim == 1:
            return rules.named(d)
        if leaf.ndim == 2 and leaf.shape[0] > leaf.shape[1]:
            return rules.named(d, None)
        return rules.named(None, d)

    leaves, treedef = jax.tree_util.tree_flatten(batch)
    # ssl arrays are [g, Pssl] (g small), seq arrays [B, L]: distinguish by
    # which axis is the sample axis — TrainBatch field order is fixed, so use
    # structural positions instead of shape heuristics.
    from sagnn_tpu.models.selfgnn import TrainBatch
    if isinstance(batch, TrainBatch):
        specs = TrainBatch(
            uids=rules.named(d), pos_iids=rules.named(d),
            neg_iids=rules.named(d), useq_row=rules.named(d),
            pair_mask=rules.named(d), seq=rules.named(d, None),
            seq_mask=rules.named(d, None), ssl_u_a=rules.named(None, d),
            ssl_i_a=rules.named(None, d), ssl_u_b=rules.named(None, d),
            ssl_i_b=rules.named(None, d), ssl_mask=rules.named(None, d))
        return specs
    return jax.tree_util.tree_unflatten(treedef, [assign(l) for l in leaves])


def opt_state_shardings(rules: ShardingRules, opt_state, params_sh):
    """Shardings for the optimizer state: Adam moments mirror the param
    shardings; every other leaf (step counts, schedule state) is replicated.

    Used as optimizer.init's out_shardings — without it, scalar counts come
    out SingleDeviceSharding-committed, which poisons checkpoint restore
    templates (a restored state would mix single-device scalars with
    mesh-sharded params in one jitted step)."""
    import optax

    def map_state(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=rules.replicated, mu=params_sh, nu=params_sh)
        if isinstance(s, tuple) and not hasattr(s, "_fields"):
            return tuple(map_state(x) for x in s)
        return jax.tree_util.tree_map(lambda _: rules.replicated, s)

    return map_state(opt_state)
