#!/bin/bash
# Round-2 pending TPU measurements, part 2 — reruns after the rope-kernel and
# scatter-GEMM lowering fixes, on a QUIET host (no concurrent CPU/TPU work;
# contended rows from run 1 are superseded by these).
set -x
cd "$(dirname "$0")/.."

# 1. Short-KV r_pack sweep (uniform_512) — run 1 rows were contended junk
rm -f results/decode_rpack_r2.jsonl
for rp in 8 16 32; do
  HPC_DECODE_RPACK=$rp timeout 900 python benchmark/attention_decode/bench_attention_decode.py \
    --cases uniform_512 --methods grid --dtypes bf16 int8 \
    --jsonl results/decode_rpack_r2.jsonl || true
done

# 2. RoPE store kernel rows (Pallas vs XLA) — fixed per-token DMA shapes
timeout 2400 python benchmark/rope_norm_store_kv/bench_rope.py \
  --impls xla pallas --jsonl results/rope_r2.jsonl

# 3. Grouped GEMM rerun (run-1 rows were contended junk)
rm -f results/gg_r2d.jsonl
timeout 2400 python benchmark/group_gemm/bench_group_gemm.py \
  --schemes pertensor blockwise blockwise_int8 int8 \
  --jsonl results/gg_r2d.jsonl

# 4. Fused MoE: per-tensor int8 (single_k fix) + per-stage attribution
timeout 2400 python benchmark/fused_moe/bench_fused_moe.py \
  --models qwen3_235b deepseek_v3 --tokens 1024 4096 --dtype int8 \
  --jsonl results/moe_r2_int8c.jsonl
timeout 2400 python benchmark/fused_moe/bench_fused_moe.py \
  --models qwen3_235b --tokens 1024 4096 --dtype int8 --stages \
  --jsonl results/moe_r2_stages.jsonl

# 5. Serving engine throughput (fixed: decode no longer routes to the
#    broken head-major Pallas store)
timeout 3000 python benchmark/serving/bench_serving.py \
  --config mid --batch 8 --multi-steps 1 8 32 --schemes bf16 int8 w8a8 \
  --jsonl results/serving_r2.jsonl
