#!/bin/bash
# Round-2 pending TPU measurements, part 3 — with the interference-robust
# min-difference estimator in benchmark/common.time_chain (part-2 rows
# showed negative latencies / 5x run variance from bursty external load on
# the shared tunnel host). QUIET host: nothing else running.
set -x
cd "$(dirname "$0")/.."

# 1. Grouped GEMM (supersedes the junk gg_r2d rows)
rm -f results/gg_r2d.jsonl
timeout 3000 python benchmark/group_gemm/bench_group_gemm.py \
  --schemes pertensor blockwise blockwise_int8 int8 \
  --jsonl results/gg_r2d.jsonl

# 2. Fused MoE per-tensor int8 + per-stage attribution
timeout 2400 python benchmark/fused_moe/bench_fused_moe.py \
  --models qwen3_235b deepseek_v3 --tokens 1024 4096 --dtype int8 \
  --jsonl results/moe_r2_int8c.jsonl
timeout 2400 python benchmark/fused_moe/bench_fused_moe.py \
  --models qwen3_235b --tokens 1024 4096 --dtype int8 --stages \
  --jsonl results/moe_r2_stages.jsonl

# 3. RoPE store (inner=50 so the differential clears host noise)
rm -f results/rope_r2.jsonl
timeout 2400 python benchmark/rope_norm_store_kv/bench_rope.py \
  --impls xla pallas --jsonl results/rope_r2.jsonl

# 4. Decode: NHD_FUSED (slot-leading, one DMA/page for all heads) vs FUSED
timeout 3000 python benchmark/attention_decode/bench_attention_decode.py \
  --cases uniform_512 uniform_4096 skewed_mix one_64k_31x4k \
  --methods grid --dtypes bf16 int8 int8_nhd \
  --jsonl results/decode_nhdfused_r2.jsonl

# 5. Headline bench x3 (min estimator)
for i in 1 2 3; do timeout 580 python bench.py; done

# 6. Serving engine throughput (int8 now rides the NHD_FUSED layout +
#    compiled Pallas store)
rm -f results/serving_r2.jsonl
timeout 3000 python benchmark/serving/bench_serving.py \
  --config mid --batch 8 --multi-steps 1 8 32 --schemes bf16 int8 w8a8 \
  --jsonl results/serving_r2.jsonl

# 7. Short-KV r_pack sweep (uniform_512, head-major FUSED packed kernel)
rm -f results/decode_rpack_r2.jsonl
for rp in 8 16 32; do
  HPC_DECODE_RPACK=$rp timeout 900 python benchmark/attention_decode/bench_attention_decode.py \
    --cases uniform_512 --methods grid --dtypes bf16 int8 \
    --jsonl results/decode_rpack_r2.jsonl || true
done
