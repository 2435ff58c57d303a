#!/bin/bash
# Round-2 pending TPU measurements, part 4 — prioritized rerun of the
# part-3 list (part 3 never ran: tunnel outage). QUIET host.
set -x
cd "$(dirname "$0")/.."

# 1. Decode: NHD_FUSED vs FUSED vs bf16 grid across scenarios
timeout 1800 python benchmark/attention_decode/bench_attention_decode.py \
  --cases uniform_512 uniform_4096 skewed_mix one_64k_31x4k \
  --methods grid --dtypes bf16 int8 int8_nhd \
  --jsonl results/decode_nhdfused_r2.jsonl

# 2. RoPE store (Pallas vs XLA)
timeout 1500 python benchmark/rope_norm_store_kv/bench_rope.py \
  --impls xla pallas --jsonl results/rope_r2.jsonl

# 3. Grouped GEMM all schemes
timeout 1800 python benchmark/group_gemm/bench_group_gemm.py \
  --schemes pertensor blockwise blockwise_int8 int8 \
  --jsonl results/gg_r2d.jsonl

# 4. Fused MoE per-tensor int8 + per-stage attribution
timeout 1500 python benchmark/fused_moe/bench_fused_moe.py \
  --models qwen3_235b deepseek_v3 --tokens 1024 4096 --dtype int8 \
  --jsonl results/moe_r2_int8c.jsonl
timeout 1200 python benchmark/fused_moe/bench_fused_moe.py \
  --models qwen3_235b --tokens 1024 4096 --dtype int8 --stages \
  --jsonl results/moe_r2_stages.jsonl

# 5. Serving engine throughput
timeout 1800 python benchmark/serving/bench_serving.py \
  --config mid --batch 8 --multi-steps 1 8 32 --schemes bf16 int8 w8a8 \
  --jsonl results/serving_r2.jsonl

# 6. Headline bench x2 more (one run already logged 1444.35 / 1.8565)
for i in 1 2; do timeout 580 python bench.py; done

# 7. Short-KV r_pack sweep
for rp in 8 16 32; do
  HPC_DECODE_RPACK=$rp timeout 700 python benchmark/attention_decode/bench_attention_decode.py \
    --cases uniform_512 --methods grid --dtypes bf16 int8 \
    --jsonl results/decode_rpack_r2.jsonl || true
done

echo "PENDING4 DONE"
