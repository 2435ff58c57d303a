#!/bin/bash
# Round-2 pending TPU measurements — run when the axon tunnel is up.
# Each step appends raw rows to results/*.jsonl; BENCHMARKS.md quotes them.
set -x
cd "$(dirname "$0")/.."

# 1. Grouped GEMM: reworked blockwise fp8 + new native int8 blockwise
timeout 2400 python benchmark/group_gemm/bench_group_gemm.py \
  --schemes blockwise blockwise_int8 int8 \
  --jsonl results/gg_r2d.jsonl

# 2. Fused MoE: blockwise int8 + per-stage attribution + deepseek rerun
timeout 2400 python benchmark/fused_moe/bench_fused_moe.py \
  --models qwen3_235b deepseek_v3 --tokens 1024 4096 --dtype int8 \
  --jsonl results/moe_r2_int8c.jsonl
timeout 2400 python benchmark/fused_moe/bench_fused_moe.py \
  --models qwen3_235b deepseek_v3 --tokens 1024 4096 --dtype int8 --blockwise \
  --jsonl results/moe_r2_bwint8.jsonl
timeout 2400 python benchmark/fused_moe/bench_fused_moe.py \
  --models qwen3_235b --tokens 1024 4096 --dtype int8 --stages \
  --jsonl results/moe_r2_stages.jsonl

# 3. RoPE store kernel rows (Pallas vs XLA) — BENCHMARKS "TPU rows pending"
timeout 2400 python benchmark/rope_norm_store_kv/bench_rope.py \
  --impls xla pallas --jsonl results/rope_r2.jsonl

# 4. Prefill: dense vs splash baseline + sparse ratio on the fp8-bits path
timeout 3000 python benchmark/attention_prefill/bench_attention_prefill.py \
  --jsonl results/prefill_r2b.jsonl

# 5. Headline bench reproducibility (3 runs)
for i in 1 2 3; do timeout 580 python bench.py; done

# 6. Serving engine throughput: fused multi-step decode + int8 KV (TPU)
timeout 2400 python benchmark/serving/bench_serving.py \
  --config mid --batch 8 --multi-steps 1 8 32 --schemes bf16 int8 w8a8 \
  --jsonl results/serving_r2.jsonl

# 7. Prefill tile sweep (tq x kv-chunk) for default selection
timeout 3000 python exp/prefill_sweep.py 2>&1 | tee results/prefill_sweep_r2.txt

# 8. Short-KV r_pack sweep (uniform_512): is 16/32 better than 8?
for rp in 8 16 32; do
  HPC_DECODE_RPACK=$rp timeout 900 python benchmark/attention_decode/bench_attention_decode.py \
    --cases uniform_512 --methods grid --dtypes bf16 int8 \
    --jsonl results/decode_rpack_r2.jsonl || true
done
