"""sagnn_tpu — a TPU-native framework for SelfGNN-style sequential recommenders.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
SA-GNN repository (SelfGNN, SIGIR 2024): time-interval bipartite graphs,
LightGCN-style message passing, LSTM + multi-head-attention temporal fusion,
a pooled-sequence attention branch, and the personalized self-augmented
denoising SSL loss — all expressed as functional JAX transforms over static
shapes, scaled over `jax.sharding.Mesh` device meshes.

Package layout:
  config    — typed dataclass configs + per-dataset presets (ref: Params.py, *.sh)
  data      — loaders, scripted preprocessing, synthetic graphs, padded edge
              blocks, vectorized samplers (ref: DataHandler.py, notebooks)
  ops       — compute kernels: segment-sum propagation, Pallas SpMM,
              exp-attention, LSTM scan (ref: model.py:80-92, Utils/attention.py)
  models    — the SelfGNN model as init/apply pure functions (ref: model.py:104-205)
  train     — trainer, losses, metrics, checkpointing (ref: model.py:18-71,207-527)
  parallel  — mesh construction, sharding rules, edge partitioning
  utils     — logging, profiling, timers (ref: Utils/TimeLogger.py)
"""

__version__ = "0.1.0"

from sagnn_tpu.config import ModelConfig, TrainConfig, DataConfig, Config, PRESETS

__all__ = [
    "ModelConfig",
    "TrainConfig",
    "DataConfig",
    "Config",
    "PRESETS",
    "__version__",
]
