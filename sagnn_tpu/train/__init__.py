from sagnn_tpu.train.metrics import topk_metrics, MetricsHistory
from sagnn_tpu.train.trainer import Trainer
