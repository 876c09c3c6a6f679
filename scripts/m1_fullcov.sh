#!/bin/sh
# 1M-node FULL-COVERAGE training, bf16 throughput mode (DESIGN.md §8):
# 1,048,576 users x 786,432 items x 60M edges on ONE chip, batch 4096
# = 256 steps/epoch visiting every user, 7.5 s/step measured
# (BENCH_1M.json guard: bench_1m.py bf16_b4096). Runs under the wedge
# watchdog; full-sort eval over 16,384 held-out users each epoch.
# lr 3e-3 = sqrt(8) large-batch scaling of the reference's 1e-3 at 8x
# its batch: measured round 5, ONE epoch reaches full-sort HR@10 0.0012
# vs 4 epochs to 0.0014 at the unscaled 1e-3 (round-4 run) — ~3-4x
# fewer epochs to the same quality, step time unchanged.
python main.py --supervise --supervise_wedge_secs 600 --data synthetic \
  --synth_users 1048576 --synth_items 786432 --synth_edges 60000000 \
  --synth_test_users 16384 \
  --graphNum 3 --gnn_layer 2 --att_layer 1 --latdim 64 \
  --num_attention_heads 8 --ssldim 48 \
  --batch 4096 --trnNum 1048576 --sampNum 10 --sslNum 8 \
  --tstEpoch 1 --testSize 100 --full_sort \
  --spmm_backend pallas --remat --fusion_chunk_rows 32768 --bf16 \
  --lr 3e-3 \
  --save_path m1_fullcov --seed 0 "$@"
