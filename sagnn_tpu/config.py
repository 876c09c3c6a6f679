"""Typed configuration for sagnn_tpu.

Replaces the reference's module-global argparse namespace (Params.py:3-53)
with frozen dataclasses. Dead reference flags (memosize, rank, hyperNum,
hyperReg, target, nfs, deep_layer, mult, att_size, subUsrSize, subUsrDcy,
divSize, graphSampleN, slot, temp — none of which are read on a live code
path) are intentionally dropped.

Per-dataset presets mirror the four launch scripts (gowalla.sh, movielens.sh,
yelp.sh, amazon.sh).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters (ref: Params.py + model.py:104-205)."""

    latdim: int = 64            # embedding size (Params.py:13)
    graph_num: int = 8          # number of time-interval graphs (Params.py:10)
    gnn_layer: int = 2          # propagation hops per interval (Params.py:23)
    att_layer: int = 4          # sequence-branch attention layers (Params.py:45)
    num_heads: int = 16         # attention heads (Params.py:21)
    ssldim: int = 32            # meta-network hidden dim (Params.py:14)
    pos_length: int = 200       # max sequence length (Params.py:43)
    leaky: float = 0.5          # leaky-relu slope (Params.py:38); note the
                                # shell presets rely on the default except
                                # movielens.sh which sets it explicitly
    keep_rate: float = 0.5      # dropout keep rate (Params.py:31)
    # Parity quirks (SURVEY.md §7.0). parity=True reproduces the reference's
    # observable semantics exactly (Q1-Q6); turning it off enables the
    # "fixed" variants (stable softmax, per-token sequence attention).
    stable_softmax: bool = False    # Q5: ref uses raw exp attention
    per_token_seq_attention: bool = False  # Q3: ref pools seq to 1 token
    # SpMM propagation backend: "xla" (jax.ops.segment_sum reference path)
    # or "pallas" (ops/spmm_pallas.py one-hot-matmul kernel, no scatter).
    spmm_backend: str = "xla"
    spmm_exact: bool = True         # pallas: 3-pass f32 MXU (parity) vs bf16
    spmm_chunk_size: int = 0        # pallas plan edges/chunk; 0 = auto from
                                    # the block-fill histogram (13% step win
                                    # at gowalla-like fill vs fixed 1024)
    # SOURCE-SHARDED pallas SpMM for huge node tables: XLA's row-gather
    # drops ~4.2x once the source operand passes ~32 MB (measured, see
    # ops/spmm_pallas.py); sharding the table keeps every gather on the
    # fast path (5.1x on 100M-edge graphs). 0 = auto (Trainer enables it,
    # with a ~32 MB/latdim shard size, when a node table crosses the
    # cliff); -1 = force off; >0 = explicit rows per source shard.
    # Unweighted parity propagation only (no edge_norm/dropout/attention).
    spmm_src_shard_rows: int = 0
    # ROW-FOLDED gathers for exact-f32 mode: propagation gathers read the
    # node table through an [N/2, 2D] view whose feature-minor relayout
    # copy has ZERO lane padding (the plain [N, 64] f32 copy pads 2.0x —
    # the 1M-node exact-mode memory deficit, DESIGN.md §8); the half-
    # select happens inside the Pallas kernel (VMEM mux — an XLA-level
    # select costs a full extra HBM pass, probe_rowfold.py). Applies to
    # the unweighted pallas + src-sharded paths when node counts are
    # even, in BOTH exact-f32 and bf16 modes (bf16 [N, 64] rows lane-pad
    # 2x just like f32; only the weighted kernel is excluded). Whether it
    # is a speedup is shape-dependent — see the three measured regimes in
    # docs/DESIGN.md §8 (real-dataset fill: 15-22% faster; dense
    # microbench: +16%; 1M-scale bf16 src-sharded: +10%).
    spmm_fold_gather: bool = False
    # Q2 variant: sym-sqrt degree-normalized propagation (what the
    # reference's transToLsts(norm=True) computes before the int32 cast
    # destroys it, DataHandler.py:50-59). None = parity (unweighted).
    edge_norm: Optional[str] = None  # None | "sym_sqrt" | "mean"
    # Q1 variant: FUNCTIONAL edge dropout (what the reference's edgeDropout
    # MEANT to do before the value-ignoring propagation neutered it,
    # model.py:93-102): per-step Bernoulli edge mask scaled by 1/keep,
    # drawn independently per direction like the reference's two
    # edgeDropout calls. 1.0 = parity (off). Backends: xla, pallas
    # (weighted kernel); not wired for ring (host-bucketed weights).
    edge_dropout_keep: float = 1.0
    # sequence-parallel per-token attention (non-parity): shard the
    # pos_length axis over the mesh's 'model' axis and run ring attention
    # (K/V blocks rotate between ICI neighbors, flash-style streaming
    # softmax — parallel/ring_attention.py). Requires
    # per_token_seq_attention=True and a mesh; pos_length must divide the
    # 'model' axis size.
    seq_parallel: bool = False
    # GAT-style edge-attention propagation (non-parity): per-edge scores
    # from the endpoint embeddings (SDDMM), softmax-normalized per target
    # node, driving a weighted aggregation. Requires spmm_backend="pallas"
    # (the SDDMM/weighted-SpMM kernel pair); mutually exclusive with
    # edge_norm (attention IS the edge weighting).
    edge_attention: bool = False
    # rematerialize the per-interval propagation in the backward pass
    # (jax.checkpoint): activations of the g×gnn_layer×2 hops are recomputed
    # instead of stored — trades FLOPs for HBM on large graphs
    remat_propagation: bool = False
    # stream the temporal-fusion node axis in blocks of this many rows
    # (lax.map; the stack is row-parallel per node): bounds the live
    # LSTM/attention temporaries at huge node counts. 0 = unchunked.
    fusion_chunk_rows: int = 0
    # compute dtype for the temporal-fusion + sequence-attention stack
    # (LSTM, MHSAs): "bf16" halves the bandwidth of the [N, g, D] streams on
    # the MXU-heavy fusion path; params and losses stay f32. Parity mode
    # requires f32 (Q5's raw-exp attention overflows bf16).
    fusion_dtype: str = "f32"  # "f32" | "bf16"

    @property
    def head_dim(self) -> int:
        assert self.latdim % self.num_heads == 0
        return self.latdim // self.num_heads


@dataclass(frozen=True)
class TrainConfig:
    """Optimization / loop hyperparameters (ref: Params.py, model.py:241-250)."""

    lr: float = 1e-3            # Params.py:5
    batch: int = 512            # users per step (Params.py:6)
    reg: float = 1e-5           # L2 weight (Params.py:8)
    ssl_reg: float = 1e-4       # SSL loss weight (Params.py:41)
    epoch: int = 100            # Params.py:9
    decay: float = 0.96         # staircase LR decay rate (Params.py:11)
    trn_num: int = 10000        # users sampled per epoch (Params.py:24)
    samp_num: int = 40          # positives per user per step; the reference
                                # hardcodes sample_num_list=[40] (model.py:346)
    ssl_num: int = 20           # SSL pairs per user per interval (Params.py:19)
    pred_num: int = 5           # target-position randomization range (Params.py:46)
    test_size: int = 100        # candidates per test user (Params.py:18)
    tst_epoch: int = 3          # test cadence (Params.py:35)
    shoot: int = 10             # the headline K (Params.py:26)
    test_mode: bool = True      # True: test on tstInt; False: validation on
                                # last sequence item (Params.py:48, model.py:398-402)
    full_sort: bool = False     # rank the positive against the FULL catalog
                                # (minus the user's own input items) instead
                                # of the reference's 999-precomputed-negative
                                # protocol (no reference analog; the stricter
                                # standard rec-sys evaluation)
    full_sort_chunk: int = 0    # full-sort eval catalog chunking: 0 = auto
                                # (stream in 65,536-item chunks once the
                                # catalog passes 131,072 items — the dense
                                # [B, I] score matrix is ~1 GB/batch at 1M
                                # items); -1 = force dense; >0 = explicit
                                # items per chunk (streaming rank, see
                                # train.metrics.streaming_positive_ranks)
    seed: int = 100             # main.py:21-23
    save_path: str = "tem"      # Params.py:12
    load_model: Optional[str] = None
    time_budget_h: float = 0.0  # >0: stop cleanly at an epoch boundary
                                # when the NEXT epoch (predicted from the
                                # measured mean epoch time) would exceed
                                # this wall-clock budget — the run
                                # finalizes checkpoints and prints the max
                                # line instead of being killed mid-epoch
                                # (preemptible-quota surface; resume with
                                # --load_model is trajectory-exact). No
                                # reference analog.

    @property
    def decay_step(self) -> int:
        # Params.py:53: args.decay_step = trnNum // batch
        return max(1, self.trn_num // self.batch)

    @property
    def steps_per_epoch(self) -> int:
        return -(-self.trn_num // self.batch)


@dataclass(frozen=True)
class DataConfig:
    """Dataset identity and location (ref: DataHandler.py:71-102)."""

    data: str = "yelp"
    data_dir: str = "./Datasets"
    noise_percent: float = 0.0  # --percent noise-robustness mode (Params.py:42)

    @property
    def predir(self) -> str:
        # DataHandler.py:73-80 special-cases capitalized Yelp
        name = {"yelp": "Yelp"}.get(self.data, self.data)
        return f"{self.data_dir}/{name}"


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)

    def replace(self, **sections) -> "Config":
        return dataclasses.replace(self, **sections)

    @staticmethod
    def preset(name: str, **overrides) -> "Config":
        cfg = PRESETS[name]
        if overrides:
            cfg = dataclasses.replace(cfg, **overrides)
        return cfg


# Per-dataset presets, mirroring the launch scripts verbatim.
PRESETS = {
    # gowalla.sh: --lr 2e-3 --reg 1e-2 --ssl_reg 1e-6 --epoch 150 --batch 512
    #   --sslNum 40 --graphNum 3 --gnn_layer 2 --att_layer 1 --testSize 1000
    #   --ssldim 48
    "gowalla": Config(
        model=ModelConfig(graph_num=3, gnn_layer=2, att_layer=1, ssldim=48),
        train=TrainConfig(lr=2e-3, reg=1e-2, ssl_reg=1e-6, epoch=150,
                          batch=512, ssl_num=40, test_size=1000,
                          save_path="gowalla"),
        data=DataConfig(data="gowalla"),
    ),
    # movielens.sh: --lr 1e-3 --reg 1e-2 --ssl_reg 1e-6 --sslNum 90
    #   --graphNum 6 --gnn_layer 2 --att_layer 3 --testSize 1000 --ssldim 48
    #   --keepRate 0.5 --pos_length 200 --leaky 0.5
    "movielens": Config(
        model=ModelConfig(graph_num=6, gnn_layer=2, att_layer=3, ssldim=48,
                          keep_rate=0.5, pos_length=200, leaky=0.5),
        train=TrainConfig(lr=1e-3, reg=1e-2, ssl_reg=1e-6, epoch=150,
                          batch=512, samp_num=40, ssl_num=90, test_size=1000,
                          save_path="movie6"),
        data=DataConfig(data="movielens"),
    ),
    # yelp.sh: --reg 1e-2 --ssl_reg 1e-7 --sslNum 40 --graphNum 12
    #   --gnn_layer 3 --att_layer 2 --testSize 1000 --ssldim 32 --sampNum 40
    "yelp": Config(
        model=ModelConfig(graph_num=12, gnn_layer=3, att_layer=2, ssldim=32),
        train=TrainConfig(lr=1e-3, reg=1e-2, ssl_reg=1e-7, epoch=150,
                          batch=512, samp_num=40, ssl_num=40, test_size=1000,
                          save_path="yelp12"),
        data=DataConfig(data="yelp"),
    ),
    # amazon.sh: --reg 1e-2 --lr 1e-3 --ssl_reg 1e-6 --sslNum 80 --graphNum 5
    #   --pred_num 0 --gnn_layer 3 --att_layer 4 --testSize 1000
    #   --keepRate 0.5 --sampNum 40 --pos_length 200
    "amazon": Config(
        model=ModelConfig(graph_num=5, gnn_layer=3, att_layer=4, ssldim=32,
                          keep_rate=0.5, pos_length=200),
        train=TrainConfig(lr=1e-3, reg=1e-2, ssl_reg=1e-6, epoch=150,
                          batch=512, samp_num=40, ssl_num=80, pred_num=0,
                          test_size=1000, save_path="amazon"),
        data=DataConfig(data="amazon"),
    ),
}
