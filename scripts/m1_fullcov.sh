#!/bin/sh
# 1M-node FULL-COVERAGE training, bf16 throughput mode (DESIGN.md §8):
# 1,048,576 users x 786,432 items x 60M edges on ONE chip, batch 4096
# = 256 steps/epoch visiting every user, 7.5 s/step measured
# (BENCH_1M.json guard: bench_1m.py bf16_b4096). Runs under the wedge
# watchdog; full-sort eval over 16,384 held-out users each epoch.
python main.py --supervise --supervise_wedge_secs 600 --data synthetic \
  --synth_users 1048576 --synth_items 786432 --synth_edges 60000000 \
  --synth_test_users 16384 \
  --graphNum 3 --gnn_layer 2 --att_layer 1 --latdim 64 \
  --num_attention_heads 8 --ssldim 48 \
  --batch 4096 --trnNum 1048576 --sampNum 10 --sslNum 8 \
  --tstEpoch 1 --testSize 100 --full_sort \
  --spmm_backend pallas --remat --fusion_chunk_rows 32768 --bf16 \
  --save_path m1_fullcov --seed 0 "$@"
