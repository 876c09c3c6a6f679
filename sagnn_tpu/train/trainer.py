"""Training loop (ref: Recommender.run/trainEpoch/testEpoch, model.py:41-71,
341-382, 430-482).

One jitted `train_step` contains the full forward (propagation over all
intervals, LSTM+MHSA fusion over every node, sequence branch, both losses),
backward, and the Adam update — the reference's per-step `sess.run` becomes a
single XLA executable. Optimizer: Adam with staircase exponential LR decay
(model.py:248-250), decay_step = trn_num // batch (Params.py:53).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sagnn_tpu.config import Config
from sagnn_tpu.data.graph import IntervalGraphs, compile_interval_graphs
from sagnn_tpu.data.io import DatasetBundle
from sagnn_tpu.data.sampler import Sampler
from sagnn_tpu.models.selfgnn import SelfGNN, TrainBatch, reg_loss
from sagnn_tpu.train.checkpoint import CheckpointManager
from sagnn_tpu.train.metrics import MetricsHistory, as_numpy, topk_metrics
from sagnn_tpu.utils.logger import log
from sagnn_tpu.utils.profiling import StepTimer


def scale_by_tf1_adam(b1: float = 0.9, b2: float = 0.999,
                      eps: float = 1e-8) -> optax.GradientTransformation:
    """TF1 AdamOptimizer's exact update (vs optax.adam, which differs for
    tiny gradients): TF computes

        update = lr * sqrt(1-b2^t)/(1-b1^t) * m / (sqrt(v) + eps)

    i.e. the bias corrections fold into the step size and eps is applied to
    the UNCORRECTED sqrt(v) — so TF's effective epsilon is
    eps/sqrt(1-b2^t), ~30x optax's at step 1. Verified against a captured
    reference Adam step in tests/test_tf_fixture.py."""

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=zeros,
            nu=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        count = state.count + 1
        t = count.astype(jnp.float32)
        corr = jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        out = jax.tree_util.tree_map(
            lambda m, v: corr * m / (jnp.sqrt(v) + eps), mu, nu)
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """TF1-exact Adam + staircase exponential decay (model.py:248-250; TF
    defaults beta1=0.9, beta2=0.999, eps=1e-8). The LR schedule reads the
    PRE-increment global step, like tf.train.exponential_decay under
    minimize(global_step=...)."""
    schedule = optax.exponential_decay(
        init_value=cfg.train.lr,
        transition_steps=cfg.train.decay_step,
        decay_rate=cfg.train.decay,
        staircase=True,
    )
    return optax.chain(
        scale_by_tf1_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_schedule(lambda count: -schedule(count)),
    )


def make_train_step(model: SelfGNN, optimizer: optax.GradientTransformation,
                    reg_weight: float, ssl_weight: float):
    """Pure train-step function: (state, graphs, batch, rng) -> (state, stats).

    Shared by the single-chip Trainer and the sharded/multichip paths — the
    whole forward+backward+Adam update is one XLA program (the reference's
    sess.run target list, model.py:354+373)."""

    def step(state: Dict, graphs: Dict, batch: TrainBatch, rng: jax.Array):
        def loss_fn(params):
            pre, ssl, _aux = model.train_losses(params, graphs, batch, rng)
            reg = reg_weight * reg_loss(params) + ssl_weight * ssl
            return pre + reg, (pre, reg)

        (loss, (pre, reg)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        updates, opt_state = optimizer.update(
            grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {"params": params, "opt_state": opt_state,
                     "step": state["step"] + 1}
        return new_state, {"loss": loss, "preLoss": pre, "regLoss": reg}

    return step


def graphs_to_device(g: IntervalGraphs, device=None) -> Dict[str, jnp.ndarray]:
    arrs = {
        "u_src": jnp.asarray(g.u_src), "u_tgt": jnp.asarray(g.u_tgt),
        "i_src": jnp.asarray(g.i_src), "i_tgt": jnp.asarray(g.i_tgt),
    }
    if device is not None:
        arrs = {k: jax.device_put(v, device) for k, v in arrs.items()}
    return arrs


class Trainer:
    """End-to-end trainer over one DatasetBundle."""

    def __init__(self, cfg: Config, bundle: DatasetBundle,
                 ckpt_root: str = "./Models", pad_multiple: int = 512,
                 mesh=None):
        """mesh: optional jax.sharding.Mesh ('data' × 'model'); when given,
        params/opt-state are initialized into their shardings (TP over node
        tables), graphs/batches are placed per parallel.sharding rules, and
        the jitted step runs under GSPMD."""
        assert bundle.graph_num == cfg.model.graph_num, (
            f"dataset has {bundle.graph_num} interval graphs, config says "
            f"{cfg.model.graph_num}")
        if (cfg.model.spmm_backend == "pallas"
                and cfg.model.spmm_src_shard_rows == 0):
            # auto: enable source sharding when a node table crosses XLA's
            # measured ~32 MB gather-operand cliff; shard size = the largest
            # R-multiple row count that stays under it
            import dataclasses
            cliff_rows = max(128, (32 * 2 ** 20)
                             // (4 * cfg.model.latdim) // 128 * 128)
            big = max(bundle.num_users, bundle.num_items)
            resolved = cliff_rows if big > cliff_rows else -1
            cfg = cfg.replace(model=dataclasses.replace(
                cfg.model, spmm_src_shard_rows=resolved))
        self.cfg = cfg
        self.bundle = bundle
        if cfg.model.spmm_backend == "ring":
            assert mesh is not None, (
                "spmm_backend='ring' requires a mesh (docs/API.md "
                "capability matrix, note 5)")
        self.model = SelfGNN(cfg.model, bundle.num_users, bundle.num_items,
                             mesh=mesh)
        self.graph_blocks = compile_interval_graphs(
            bundle.sub_mats, pad_multiple=pad_multiple)
        self.graphs = graphs_to_device(self.graph_blocks)
        weighted = cfg.model.edge_norm is not None
        edge_drop = cfg.model.edge_dropout_keep < 1.0
        if edge_drop:
            assert cfg.model.spmm_backend in ("xla", "pallas"), (
                "edge_dropout_keep < 1 needs the xla or pallas backend "
                "(ring weights are host-bucketed; see docs/API.md "
                "backend capability matrix, note 3)")
        ew_np = None  # host-side [2, g, E]; device copy only where consumed
        if weighted:
            from sagnn_tpu.data.graph import edge_weights
            ew_np = edge_weights(self.graph_blocks, bundle.sub_mats,
                                 norm=cfg.model.edge_norm)
        elif edge_drop:
            # dropout-only: unit base weights; pad edges are masked by the
            # plan/segment layout, so ones everywhere are safe
            gb_ = self.graph_blocks
            ew_np = np.ones((2, gb_.graph_num, gb_.u_src.shape[1]),
                            np.float32)
        if ew_np is not None and cfg.model.spmm_backend == "xla":
            # only the XLA backend reads the raw per-direction weights;
            # pallas uses edge_weights_canon, ring uses bucketed copies
            self.graphs["edge_weights"] = jnp.asarray(ew_np)
        if cfg.model.edge_attention:
            assert cfg.model.spmm_backend == "pallas", (
                "edge_attention requires spmm_backend='pallas' (docs/API.md "
                "capability matrix, note 4)")
            assert not weighted and not edge_drop, (
                "edge_attention is exclusive with edge_norm/edge_dropout "
                "(attention IS the edge weighting; docs/API.md matrix)")
        if cfg.model.seq_parallel:
            assert cfg.model.per_token_seq_attention, (
                "seq_parallel shards the per-token sequence attention; "
                "enable per_token_seq_attention (docs/API.md matrix)")
            assert mesh is not None, "seq_parallel requires a mesh"
            P_ = mesh.shape["model"]
            assert cfg.model.pos_length % P_ == 0, (
                f"pos_length {cfg.model.pos_length} must divide the "
                f"'model' axis ({P_})")
        if (cfg.model.spmm_backend == "pallas"
                and cfg.model.spmm_src_shard_rows > 0):
            from sagnn_tpu.ops.spmm_pallas import (
                build_stacked_plans_src_sharded)
            assert not weighted and not edge_drop \
                and not cfg.model.edge_attention, (
                    "spmm_src_shard_rows > 0 supports only unweighted "
                    "parity propagation (docs/API.md capability "
                    "matrix, note 1)")
            gb = self.graph_blocks
            ss = build_stacked_plans_src_sharded(
                gb.u_src, gb.u_tgt, gb.i_src, gb.i_tgt, gb.num_users,
                gb.num_items, gb.edge_counts,
                shard_rows=cfg.model.spmm_src_shard_rows,
                chunk_size=cfg.model.spmm_chunk_size)
            self.graphs["plans_ss"] = {
                "u": {k: jnp.asarray(v) for k, v in ss["u"].items()},
                "i": {k: jnp.asarray(v) for k, v in ss["i"].items()},
            }
        elif cfg.model.spmm_backend == "pallas":
            from sagnn_tpu.ops.spmm_pallas import build_stacked_plans
            gb = self.graph_blocks
            tracked = weighted or cfg.model.edge_attention or edge_drop
            i_edge_ids = None
            if tracked:
                from sagnn_tpu.data.graph import direction_permutation
                i_edge_ids = direction_permutation(gb, bundle.sub_mats)
            if weighted or edge_drop:
                from sagnn_tpu.data.graph import edge_weights_canonical
                self.graphs["edge_weights_canon"] = jnp.asarray(
                    edge_weights_canonical(ew_np, i_edge_ids))
            plans = build_stacked_plans(gb.u_src, gb.u_tgt, gb.i_src,
                                        gb.i_tgt, gb.num_users, gb.num_items,
                                        gb.edge_counts,
                                        track_edges=tracked,
                                        i_edge_ids=i_edge_ids,
                                        chunk_size=cfg.model.spmm_chunk_size)
            self.graphs["plans"] = {
                "u": {k: jnp.asarray(v) for k, v in plans["u"].items()},
                "i": {k: jnp.asarray(v) for k, v in plans["i"].items()},
            }
        if cfg.model.spmm_backend == "ring":
            from sagnn_tpu.parallel.edge_partition import (
                build_interval_ring_partitions)
            # pallas kernel on the ring by default; the XLA-scatter ring
            # stays for direction-dependent weights ('mean' — asymmetric,
            # so the paired-plan VJP would transpose the wrong weights)
            pallas_ring = cfg.model.edge_norm in (None, "sym_sqrt")
            ring = build_interval_ring_partitions(
                self.graph_blocks, mesh.shape["model"],
                weights=(ew_np if weighted else None),
                bucket_plans=pallas_ring)
            if pallas_ring:
                for d in ("u_plan", "i_plan"):
                    ring[d].pop("num_blocks", None)
                self.graphs["ring"] = {
                    d: {k: jnp.asarray(v) for k, v in ring[d].items()}
                    for d in ("u_plan", "i_plan")}
            else:
                keys = ["u_src_local", "u_tgt_local", "i_src_local",
                        "i_tgt_local"]
                if weighted:
                    keys += ["u_weights", "i_weights"]
                self.graphs["ring"] = {k: jnp.asarray(ring[k])
                                       for k in keys}
        if (cfg.model.spmm_backend in ("pallas", "ring")
                and not cfg.model.edge_attention):
            # the pallas/ring propagation paths read only their
            # plan/bucket pytrees — the raw [g, E] COO blocks would ride
            # the step as dead device args (~1 GB at 60M edges; the xla
            # backend and the edge-attention variant still need them)
            for k in ("u_src", "u_tgt", "i_src", "i_tgt"):
                self.graphs.pop(k, None)
        self.sampler = Sampler(
            bundle=bundle, batch=cfg.train.batch,
            samp_num=cfg.train.samp_num, ssl_num=cfg.train.ssl_num,
            pred_num=cfg.train.pred_num, pos_length=cfg.model.pos_length,
            test_size=cfg.train.test_size, seed=cfg.train.seed)
        self.optimizer = make_optimizer(cfg)
        self.ckpt = CheckpointManager(ckpt_root, cfg.train.save_path)
        self.history = MetricsHistory()
        self.rng = jax.random.PRNGKey(cfg.train.seed)
        self.step_timer = StepTimer()
        # edges processed per step: 2 directions × gnn_layer hops × REAL
        # edges summed over intervals (SURVEY.md §6 metric). Padded slots
        # are counted separately: on skewed datasets (yelp's 12 intervals
        # all padded to the max interval's nnz) the padded-slot rate can
        # inflate by the pad fraction, so it is observability for executed
        # work, not the headline.
        self.edges_per_step = (2 * cfg.model.gnn_layer
                               * int(self.graph_blocks.edge_counts.sum()))
        self.padded_edges_per_step = (2 * cfg.model.gnn_layer
                                      * self.graph_blocks.graph_num
                                      * self.graph_blocks.edges_padded)

        self.mesh = mesh
        self.rng, init_key = jax.random.split(self.rng)
        if mesh is not None:
            from sagnn_tpu.parallel.distributed import init_sharded_state
            from sagnn_tpu.parallel.sharding import ShardingRules
            self._rules = ShardingRules(mesh)
            with mesh:
                self.state = init_sharded_state(self._rules, self.model,
                                                self.optimizer, init_key)
                self.graphs = self._shard_graphs()
        else:
            params = self.model.init(init_key)
            self.state = {
                "params": params,
                "opt_state": self.optimizer.init(params),
                "step": jnp.zeros((), jnp.int32),
            }
        self._train_step = jax.jit(
            make_train_step(self.model, self.optimizer, cfg.train.reg,
                            cfg.train.ssl_reg),
            donate_argnums=(0,))
        self._encode_eval = jax.jit(
            lambda params, graphs: self.model.encode(params, graphs,
                                                     train=False)[:2])
        self._score_eval = jax.jit(self._score_eval_impl)
        self._full_sort_eval = jax.jit(self._full_sort_eval_impl)

    def _shard_graphs(self):
        from sagnn_tpu.parallel.sharding import graph_shardings
        plan_keys = ("plans", "plans_ss")
        sh = graph_shardings(self._rules,
                             {k: v for k, v in self.graphs.items()
                              if k not in plan_keys})
        out = {k: jax.device_put(v, sh[k]) for k, v in self.graphs.items()
               if k not in plan_keys}
        for pk in plan_keys:
            if pk in self.graphs:
                # plans are replicated (chunk schedules are not shardable
                # along the edge axis without replanning)
                rep = self._rules.replicated
                out[pk] = jax.tree_util.tree_map(
                    lambda a: jax.device_put(a, rep), self.graphs[pk])
        return out

    def load_imported_params(self, params: Dict, mu: Optional[Dict] = None,
                             nu: Optional[Dict] = None, step: int = 0
                             ) -> None:
        """Install externally-imported weights (e.g. a reference TF1 Saver
        checkpoint via train.import_tf1), replacing the freshly-initialized
        state. With mu/nu/step (the Adam moments + saved global step) the
        optimizer state is reconstructed too, so training continues exactly
        where the reference run stopped; otherwise Adam restarts at step 0.
        """
        def check(new, old):  # structure mismatch raises inside tree_map
            if np.shape(new) != old.shape:
                raise ValueError(f"imported param shape {np.shape(new)} "
                                 f"!= model {old.shape}")

        jax.tree_util.tree_map(check, params, self.state["params"])
        if (mu is None) != (nu is None):
            raise ValueError("mu and nu must be given together (Adam's "
                             "first and second moments)")
        if self.mesh is not None:
            from sagnn_tpu.parallel.sharding import param_shardings
            p_sh = param_shardings(self._rules, self.state["params"])
            put = functools.partial(jax.tree_util.tree_map, jax.device_put)
            rep = self._rules.replicated

            def count():  # fresh buffer each use: the step donates state
                return jax.device_put(np.int32(step), rep)

            params = put(params, p_sh)
            if mu is None:
                with self.mesh:
                    opt_state = jax.jit(self.optimizer.init)(params)
            else:
                opt_state = (
                    optax.ScaleByAdamState(count=count(), mu=put(mu, p_sh),
                                           nu=put(nu, p_sh)),
                    optax.ScaleByScheduleState(count=count()))
        else:
            def count():
                return jnp.array(step, jnp.int32)

            params = jax.tree_util.tree_map(jnp.asarray, params)
            if mu is None:
                opt_state = self.optimizer.init(params)
            else:
                opt_state = (
                    optax.ScaleByAdamState(
                        count=count(),
                        mu=jax.tree_util.tree_map(jnp.asarray, mu),
                        nu=jax.tree_util.tree_map(jnp.asarray, nu)),
                    optax.ScaleByScheduleState(count=count()))
        if mu is not None:
            # the hand-built tuple is coupled to make_optimizer's chain
            # layout; catch drift (e.g. an added transform) at install time
            # instead of inside the donated jitted step
            want = jax.tree_util.tree_structure(
                jax.eval_shape(self.optimizer.init, self.state["params"]))
            got = jax.tree_util.tree_structure(opt_state)
            if got != want:
                raise ValueError(
                    f"imported optimizer state no longer matches "
                    f"make_optimizer's chain: {got} != {want}")
        self.state = {"params": params, "opt_state": opt_state,
                      "step": count()}

    # -- jitted bodies -----------------------------------------------------

    def _score_eval_impl(self, params, final_user, final_item, user_ids,
                         cand, seq, seq_mask, valid):
        scores = self.model.score_with_encodings(
            params, final_user, final_item, user_ids, cand, seq, seq_mask)
        return topk_metrics(scores, ks=(1, 5, 10, 15, 20), valid=valid)

    def _full_sort_eval_impl(self, params, final_user, final_item, user_ids,
                             pos_items, seq, seq_mask, excl_idx, valid):
        from sagnn_tpu.train.metrics import (full_sort_metrics,
                                             metrics_from_ranks,
                                             streaming_positive_ranks)
        chunk = self.cfg.train.full_sort_chunk
        num_items = final_item.shape[0]
        if chunk == 0:
            # auto: dense [B, I] scores for small catalogs, streamed past
            # the shared policy threshold (1 GB/batch at 1M items)
            from sagnn_tpu.ops.chunking import auto_chunk_rows
            chunk = auto_chunk_rows(num_items)
        if chunk > 0:
            queries = self.model.serving_queries(
                params, final_user, final_item, user_ids, seq, seq_mask)
            ranks = streaming_positive_ranks(
                queries, final_item, pos_items, excl_idx, num_items,
                chunk_items=chunk)
            return metrics_from_ranks(ranks, valid=valid,
                                      ks=(1, 5, 10, 15, 20))
        scores = self.model.score_all_items(
            params, final_user, final_item, user_ids, seq, seq_mask)
        # excl_idx: [B, K] per-user history item ids, pad = num_items —
        # out-of-range scatter indices are dropped (no dense [B, I] mask)
        rows = jnp.arange(scores.shape[0])[:, None]
        scores = scores.at[rows, excl_idx].set(-jnp.inf, mode="drop")
        return full_sort_metrics(scores, pos_items, valid=valid,
                                 ks=(1, 5, 10, 15, 20))

    # -- epochs --------------------------------------------------------------

    def train_epoch(self, verbose: bool = True) -> Dict[str, float]:
        """One epoch with host/device overlap: batch i+1 is sampled (numpy/
        C++, GIL released) while step i runs on device — the reference
        serializes sampling and sess.run (model.py:349-373).

        Stats are fetched with a ONE-STEP LAG: fetching step i's scalars
        immediately would block until the device (and, on this link, a
        ~17 ms relay round-trip) finishes step i before step i+1 can even be
        dispatched. Deferring the fetch by one step keeps a step in flight
        at all times, so the host-side fetch/log of step i-1 rides under
        step i's device execution."""
        import concurrent.futures

        cfg = self.cfg
        ids = self.sampler.epoch_user_ids(cfg.train.trn_num)
        steps = int(np.ceil(len(ids) / cfg.train.batch))
        epoch_loss = epoch_pre = 0.0

        # multi-PROCESS data parallelism: every process generates the same
        # epoch permutation (identical sampler seed) but samples only the
        # batch rows its devices own; per-host local arrays assemble into
        # the global sharded batch without any cross-host transfer of
        # sample data (SURVEY §2.2 DP: "per-host sampler shards")
        multiproc = self.mesh is not None and jax.process_count() > 1
        if multiproc:
            from sagnn_tpu.parallel.launch import host_batch_slice
            h_start, h_size = host_batch_slice(cfg.train.batch)

        def sample(i):
            bat = ids[i * cfg.train.batch:(i + 1) * cfg.train.batch]
            if multiproc:
                return self._assemble_global_batch(bat, h_start, h_size)
            batch = self.sampler.train_batch(bat)
            if self.mesh is not None:
                from sagnn_tpu.parallel.sharding import batch_shardings
                batch = jax.tree_util.tree_map(
                    jax.device_put, batch,
                    batch_shardings(self._rules, batch))
            return batch

        def consume(i, pending):
            nonlocal epoch_loss, epoch_pre
            stats = {k: float(v) for k, v in pending.items()}
            epoch_loss += stats["loss"]
            epoch_pre += stats["preLoss"]
            if verbose:
                log(f"Step {i}/{steps}: preloss = "
                    f"{stats['preLoss']:.2f}, "
                    f"REGLoss = {stats['regLoss']:.2f}         ",
                    save=False, oneline=True)

        import contextlib
        mesh_ctx = self.mesh if self.mesh is not None else \
            contextlib.nullcontext()
        pending = None
        self._steps_last_epoch = steps
        with concurrent.futures.ThreadPoolExecutor(1) as pool, mesh_ctx:
            nxt = pool.submit(sample, 0)
            for i in range(steps):
                batch = nxt.result()
                if i + 1 < steps:
                    nxt = pool.submit(sample, i + 1)
                self.rng, key = jax.random.split(self.rng)
                self.step_timer.tic()
                self.state, stats = self._train_step(self.state, self.graphs,
                                                     batch, key)
                # each timed sample = dispatch(i) + fetch of step i-1's
                # stats (the device-completion wait); recording a sample
                # with no pending fetch would be ~0 ms of pure dispatch and
                # bias the mean low, so skip the first iteration's toc
                if pending is not None:
                    consume(i - 1, pending)
                    self.step_timer.toc()
                pending = stats
            if pending is not None:
                self.step_timer.tic()
                consume(steps - 1, pending)
                self.step_timer.toc()
        return {"Loss": epoch_loss / steps, "preLoss": epoch_pre / steps}

    def _assemble_global_batch(self, bat: np.ndarray, start: int,
                               size: int) -> TrainBatch:
        """Sample this process's slice of the global batch and lift the
        local arrays into globally-sharded jax.Arrays
        (make_array_from_process_local_data — no host gathers; the sampler's
        per-user determinism contract makes the assembled batch identical
        to a single-process run's)."""
        from sagnn_tpu.parallel.sharding import batch_shardings

        cfg = self.cfg
        local = self.sampler.train_batch_slice(bat, start, size)
        # useq_row is local to this host's seq rows; the jitted step gathers
        # from the GLOBAL [B, L] seq array
        local.useq_row = local.useq_row + np.int32(start)
        sh = batch_shardings(self._rules, local)
        B = cfg.train.batch
        g, L = cfg.model.graph_num, cfg.model.pos_length
        pairs = (B * self.sampler.samp_num,)
        pssl = (g, B * self.sampler.ssl_num)
        # flatten order = TrainBatch pytree registration order
        shapes = [pairs] * 5 + [(B, L)] * 2 + [pssl] * 5
        l_leaves, treedef = jax.tree_util.tree_flatten(local)
        s_leaves = jax.tree_util.tree_leaves(sh)
        out = [jax.make_array_from_process_local_data(s, loc, gs)
               for loc, s, gs in zip(l_leaves, s_leaves, shapes)]
        return jax.tree_util.tree_unflatten(treedef, out)

    # -- trajectory-exact resume (no reference analog: the reference loses
    # all RNG state on resume, model.py:522-527) --------------------------

    def capture_rng_state(self, next_epoch: int) -> Dict:
        """JSON-able snapshot of every host RNG the training trajectory
        depends on: the sampler's bit-generator (epoch permutations, batch
        seeds, SSL draws) and the trainer's JAX key (LSTM dropout stream).
        Saved alongside checkpoints so a preempted-and-resumed run replays
        the uninterrupted run bit-for-bit from `next_epoch`."""
        return {
            "sampler": self.sampler.rng.bit_generator.state,
            "jax_key": np.asarray(self.rng).tolist(),
            "epoch": int(next_epoch),
        }

    def restore_rng_state(self, rs: Dict) -> int:
        """Install a capture_rng_state snapshot; returns its epoch."""
        self.sampler.rng.bit_generator.state = rs["sampler"]
        self.rng = jnp.asarray(np.asarray(rs["jax_key"], np.uint32))
        return int(rs["epoch"])

    def throughput_stats(self, window: int | None = None) -> Dict[str, float]:
        """Step-time and propagation edges/s observability (SURVEY.md §5).

        Defaults to the LAST epoch's steps (earlier epochs carry compile
        time and would drag the cumulative mean); pass window=0 for the
        full history."""
        if window is None:
            window = getattr(self, "_steps_last_epoch", 0)
        t = self.step_timer.windowed(window)
        mean = t.mean
        return {
            "step_ms_mean": mean * 1e3,
            "step_ms_p50": t.percentile(50) * 1e3,
            "step_ms_p95": t.percentile(95) * 1e3,
            # true-edge rate (real nnz summed over intervals) — the honest
            # throughput; padded-slot rate counts executed pad work too
            "edges_per_sec": (self.edges_per_step / mean
                              if t.times else 0.0),
            "padded_edges_per_sec": (self.padded_edges_per_step / mean
                                     if t.times else 0.0),
        }

    def test_epoch(self, dump_uid: int | None = None,
                   full_sort: bool | None = None) -> Dict[str, float]:
        """dump_uid >= 0 prints that batch row's candidate scores, the
        reference's --uid debug mode (model.py:460-461, candidate protocol
        only); defaults to the trainer-level `debug_uid` (set from the CLI
        --uid flag). full_sort=True ranks the positive against the full
        catalog instead of the precomputed negatives (defaults to
        cfg.train.full_sort)."""
        if dump_uid is None:
            dump_uid = getattr(self, "debug_uid", -1)
        if full_sort is None:
            full_sort = self.cfg.train.full_sort
        import concurrent.futures

        cfg = self.cfg
        ids = np.asarray(self.bundle.tst_usrs)
        num = len(ids)
        steps = int(np.ceil(num / cfg.train.batch))
        final_user, final_item = self._encode_eval(self.state["params"],
                                                   self.graphs)

        # multi-process eval scales like training: each host samples only
        # its slice of the batch rows and lifts them into globally-sharded
        # arrays; metric sums reduce on device (GSPMD inserts the psum), so
        # host AND device eval work are 1/N per host (round-2 replicated
        # every batch on every process)
        multiproc = self.mesh is not None and jax.process_count() > 1
        if multiproc:
            from sagnn_tpu.parallel.launch import host_batch_slice
            h_start, h_size = host_batch_slice(cfg.train.batch)
            assert dump_uid < 0, "--uid debug dump is single-process only"

        def lift(arrs):
            from jax.sharding import NamedSharding, PartitionSpec as P
            B = cfg.train.batch
            out = []
            for a in arrs:
                spec = P(*(("data",) + (None,) * (a.ndim - 1)))
                sh = NamedSharding(self.mesh, spec)
                out.append(jax.make_array_from_process_local_data(
                    sh, a, (B,) + a.shape[1:]))
            return tuple(out)

        def sample(i):
            bat = ids[i * cfg.train.batch:(i + 1) * cfg.train.batch]
            cap = None
            if multiproc:
                # rows past len(bat) zero-pad with valid=0 on either path,
                # so slicing the (possibly short) tail batch stays exact
                bat = bat[h_start:h_start + h_size]
                cap = h_size
            if full_sort:
                arrs = self.sampler.full_sort_batch(
                    bat, test_mode=cfg.train.test_mode, batch_cap=cap)
            else:
                user_ids, cand, _pos, seq, seq_mask, valid = \
                    self.sampler.test_batch(
                        bat, test_mode=cfg.train.test_mode, batch_cap=cap)
                arrs = (user_ids, cand, seq, seq_mask, valid)
            if multiproc:
                return lift(arrs)
            return tuple(jnp.asarray(a) for a in arrs)

        # batch i+1 is sampled while batch i scores on device; per-batch
        # metric dicts stay on device (lazy adds) and are fetched ONCE at the
        # end — the reference syncs per batch (model.py:458-459)
        totals = None
        with concurrent.futures.ThreadPoolExecutor(1) as pool:
            nxt = pool.submit(sample, 0)
            for i in range(steps):
                arrs = nxt.result()
                if i + 1 < steps:
                    nxt = pool.submit(sample, i + 1)
                if full_sort:
                    mets = self._full_sort_eval(
                        self.state["params"], final_user, final_item, *arrs)
                else:
                    user_ids, cand, seq, seq_mask, valid = arrs
                    if dump_uid >= 0:
                        scores = self.model.score_with_encodings(
                            self.state["params"], final_user, final_item,
                            user_ids, cand, seq, seq_mask)
                        print(np.asarray(scores)[dump_uid])
                    mets = self._score_eval(
                        self.state["params"], final_user, final_item,
                        user_ids, cand, seq, seq_mask, valid)
                totals = mets if totals is None else {
                    k: totals[k] + v for k, v in mets.items()}
        totals = as_numpy(totals)
        out = {k: float(v) / num for k, v in totals.items()}
        # headline metrics keyed like the reference (shoot=10)
        out["HR"] = out[f"HR@{cfg.train.shoot}"]
        out["NDCG"] = out[f"NDCG@{cfg.train.shoot}"]
        return out

    # -- full run (ref model.py:41-71) ----------------------------------------

    def install_preemption_handler(self) -> None:
        """Save a checkpoint on SIGTERM/SIGINT before exiting (preemption
        safety — the reference loses all progress since the last best-NDCG
        save on eviction)."""
        import signal

        def _handler(signum, _frame):
            log(f"signal {signum}: writing preemption checkpoint")
            # RNG snapshot from the START of the in-progress epoch: resume
            # re-enters that epoch drawing the same batches the interrupted
            # attempt drew. (Params are preemption-time, so a mid-epoch
            # kill resumes safely but not bit-exactly — exact replay holds
            # for saves made at epoch boundaries, i.e. the best-NDCG path.)
            self.ckpt.save(self.state, self.history, self.cfg,
                           rng_state=getattr(self, "_epoch_rng_snapshot",
                                             None))
            raise SystemExit(128 + signum)

        signal.signal(signal.SIGTERM, _handler)
        signal.signal(signal.SIGINT, _handler)

    def run(self, resume: bool = False) -> Dict[str, float]:
        cfg = self.cfg
        self.install_preemption_handler()
        st_epoch = 0
        if resume or cfg.train.load_model:
            state, hist = self.ckpt.restore(self.state)
            if state is not None:
                self.state = state
                self.history = hist
                st_epoch = self.ckpt.resume_epoch(hist, cfg.train.tst_epoch)
                rs = self.ckpt.load_rng()
                if rs is not None:
                    # trajectory-exact resume: restore the host RNGs and
                    # the precise epoch; the history-length formula above
                    # stays as the fallback for old checkpoints
                    st_epoch = self.restore_rng_state(rs)
                log(f"Model Loaded, resuming at epoch {st_epoch}")

        # seed the best-NDCG tracker from the RESTORED history: starting at
        # 0.0 would let the first post-resume test epoch overwrite a BETTER
        # checkpoint (the trajectory-exact contract demands the resumed run
        # keep what the uninterrupted run would have kept)
        max_ndcg, max_res, max_epoch = 0.0, {}, 0
        ndcgs = self.history.data.get("TestNDCG", [])
        if ndcgs:
            i = int(np.argmax(ndcgs))
            max_ndcg = float(ndcgs[i])
            max_res = {"HR": float(self.history.data["TestHR"][i]),
                       "NDCG": max_ndcg}
            max_epoch = i * cfg.train.tst_epoch  # tests run every tst_epoch
        try:
            max_ndcg, max_res, max_epoch = self._epoch_loop(
                st_epoch, max_ndcg, max_res, max_epoch)
        finally:
            # an uncaught exception (e.g. runtime RESOURCE_EXHAUSTED at 1M-
            # node scale) must not discard a staged async best-NDCG save:
            # commit any in-flight checkpoint on every exit path (SIGTERM/
            # SIGINT are covered by the preemption handler; this covers
            # exceptions)
            self.ckpt.finalize()
        final = self.test_epoch()
        log(self.history.format_line("Test", cfg.train.epoch,
                                     cfg.train.epoch,
                                     {"HR": final["HR"],
                                      "NDCG": final["NDCG"]}))
        log(self.history.format_line("max", max_epoch, cfg.train.epoch,
                                     max_res))
        return max_res or final

    def _epoch_loop(self, st_epoch: int, max_ndcg: float = 0.0,
                    max_res: Optional[Dict] = None, max_epoch: int = 0):
        import time as _time
        cfg = self.cfg
        max_res = max_res or {}
        t_loop = _time.monotonic()
        epoch_times: list = []
        for ep in range(st_epoch, cfg.train.epoch):
            # --time_budget_h: stop at the epoch BOUNDARY once the next
            # epoch (predicted from the measured mean) would overrun the
            # budget — a clean finalize-and-exit instead of a mid-epoch
            # kill on preemptible quotas
            if cfg.train.time_budget_h > 0 and epoch_times:
                spent = _time.monotonic() - t_loop
                predicted = spent + float(np.mean(epoch_times))
                if predicted > cfg.train.time_budget_h * 3600.0:
                    log(f"time budget: {spent / 3600.0:.2f}h spent, next "
                        f"epoch predicted to end at "
                        f"{predicted / 3600.0:.2f}h > budget "
                        f"{cfg.train.time_budget_h}h — stopping cleanly "
                        f"at epoch {ep}")
                    break
            t_ep = _time.monotonic()
            test = (ep % cfg.train.tst_epoch == 0)
            # for the preemption handler: the RNG state this epoch STARTED
            # with (see install_preemption_handler)
            self._epoch_rng_snapshot = self.capture_rng_state(ep)
            tr = self.train_epoch()
            # failure detection (SURVEY.md §5: the reference has none): a
            # non-finite epoch loss rolls the run back to the last good
            # checkpoint instead of silently corrupting the best-NDCG state
            if not np.isfinite(tr["Loss"]):
                state, hist = self.ckpt.restore(self.state)
                if state is not None:
                    self.state = state
                    self.history = hist
                    # deliberately NOT restoring RNG state here: replaying
                    # the saved trajectory would hit the same NaN again —
                    # the advanced RNG gives the retry different batches
                    log(f"NaN guard: non-finite loss at epoch {ep}; "
                        f"restored last checkpoint and continuing")
                    continue
                raise FloatingPointError(
                    f"non-finite loss at epoch {ep} with no checkpoint to "
                    f"restore")
            self.history.append("Train", tr)
            log(self.history.format_line("Train", ep, cfg.train.epoch, tr))
            ts = self.throughput_stats()
            if ts["edges_per_sec"] > 0:
                log(f"  step {ts['step_ms_mean']:.1f} ms avg "
                    f"(p95 {ts['step_ms_p95']:.1f}), propagation "
                    f"{ts['edges_per_sec'] / 1e9:.4f} Gedges/s "
                    f"({ts['padded_edges_per_sec'] / 1e9:.4f} incl. pad "
                    f"slots)", save=False)
            if test:
                te = self.test_epoch()
                self.history.append("Test", {
                    "HR": te["HR"], "NDCG": te["NDCG"]})
                log(self.history.format_line(
                    "Test", ep, cfg.train.epoch,
                    {"HR": te["HR"], "NDCG": te["NDCG"]}))
                if te["NDCG"] > max_ndcg:  # best-NDCG save policy
                    # async: the disk write overlaps the next epochs; the
                    # commit happens at the next save/restore/finalize.
                    # RNG sidecar makes a resume from here trajectory-exact
                    self.ckpt.save(self.state, self.history, self.cfg,
                                   block=False,
                                   rng_state=self.capture_rng_state(ep + 1))
                    max_ndcg, max_res, max_epoch = te["NDCG"], te, ep
            epoch_times.append(_time.monotonic() - t_ep)
        return max_ndcg, max_res, max_epoch
