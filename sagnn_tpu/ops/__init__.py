from sagnn_tpu.ops.segment import gather_segment_sum, propagate
from sagnn_tpu.ops.attention import multi_head_self_attention, init_mhsa_params
from sagnn_tpu.ops.lstm import lstm_scan, init_lstm_params
