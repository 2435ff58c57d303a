#!/bin/bash
# Round-2 follow-up TPU measurements (run AFTER run_r2_pending.sh, host quiet):
# - grouped GEMM rerun (first gg_r2d rows were corrupted by host CPU
#   contention from concurrent pytest runs; also picks up the blockwise
#   lowering fix)
# - fused-act MoE (gate-up epilogue fusion) vs the unfused pipeline
set -x
cd "$(dirname "$0")/.."

timeout 2400 python benchmark/group_gemm/bench_group_gemm.py \
  --schemes pertensor int8 blockwise blockwise_int8 \
  --jsonl results/gg_r2e.jsonl

timeout 2400 python benchmark/fused_moe/bench_fused_moe.py \
  --models qwen3_235b deepseek_v3 --tokens 1024 4096 --dtype int8 --fuse-act \
  --jsonl results/moe_r2_fused.jsonl

# same shapes unfused, fresh same-session rows for an honest ratio
timeout 2400 python benchmark/fused_moe/bench_fused_moe.py \
  --models qwen3_235b deepseek_v3 --tokens 1024 4096 --dtype int8 \
  --jsonl results/moe_r2_fused.jsonl
