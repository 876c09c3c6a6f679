#!/bin/sh
# 1M-node FULL-COVERAGE training at EXACT f32 parity precision on ONE
# chip (DESIGN.md §8 round-5 ladder): batch 1024 + 8k fusion chunks +
# row-folded gathers is the largest-batch exact config that fits 15.75 GB
# HBM (probe_bigmem: 13.37G temps + 5.13G args). 1024 steps/epoch visit
# every user; 9.19 s/step measured (bench_1m.py exact_b1024) — a full
# exact-coverage epoch is ~2.6 h. Batch 512 + chunk16k is the roomier
# fallback (9.14 s/step, 2048 steps/epoch).
python main.py --supervise --supervise_wedge_secs 600 --data synthetic \
  --synth_users 1048576 --synth_items 786432 --synth_edges 60000000 \
  --synth_test_users 16384 \
  --graphNum 3 --gnn_layer 2 --att_layer 1 --latdim 64 \
  --num_attention_heads 8 --ssldim 48 \
  --batch 1024 --trnNum 1048576 --sampNum 10 --sslNum 8 \
  --tstEpoch 1 --testSize 100 --full_sort \
  --spmm_backend pallas --remat --fusion_chunk_rows 8192 \
  --spmm_fold_gather \
  --save_path m1_exact --seed 0 "$@"
