#!/bin/sh
# 131k-node FULL-COVERAGE convergence run (the rung between the 49k
# converged quality runs and the 1M-node capability recipe — see
# DESIGN.md §8 / BASELINE.md): 131,072 users x 98,304 items x 7.5M
# edges on ONE chip, batch 4096 = 32 steps/epoch visiting every user,
# full-sort eval over 16,384 held-out users EVERY epoch. Same flagship
# config as m1_fullcov.sh (graphNum 3, 2 GNN hops, D=64, bf16 + pallas,
# lr 3e-3 = sqrt(8) large-batch scaling) minus --remat (no memory
# pressure at this scale). Small enough to train to its best-NDCG
# plateau inside one session; runs under the wedge watchdog.
python main.py --supervise --supervise_wedge_secs 300 --data synthetic \
  --synth_users 131072 --synth_items 98304 --synth_edges 7500000 \
  --synth_test_users 16384 \
  --graphNum 3 --gnn_layer 2 --att_layer 1 --latdim 64 \
  --num_attention_heads 8 --ssldim 48 \
  --batch 4096 --trnNum 131072 --sampNum 10 --sslNum 8 \
  --tstEpoch 1 --testSize 100 --full_sort \
  --spmm_backend pallas --fusion_chunk_rows 32768 --bf16 \
  --lr 3e-3 --epoch 60 \
  --save_path m131k_fullcov --seed 0 "$@"
