from sagnn_tpu.models.selfgnn import (
    SelfGNN, TrainBatch, init_params, reg_loss,
)
