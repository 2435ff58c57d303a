#!/bin/bash
# Round-3 TPU measurement batches. Run sequentially (one TPU); each step
# appends raw rows to results/*.jsonl, which BENCHMARKS.md quotes.
set -x
cd "$(dirname "$0")/.."

# 1. Grouped GEMM: prescale blockwise (fp8 + int8) vs old schemes vs
#    per-tensor vs dense XLA (VERDICT #2: >=150 TF on the gate-up shape)
timeout 2400 python benchmark/group_gemm/bench_group_gemm.py \
  --schemes pertensor int8 blockwise blockwise_int8 \
  --jsonl results/gg_r3.jsonl

# 2. Fused MoE: per-stage attribution + EP small-token sweep + hunyuan_v3
#    (VERDICT #5: stage table + >=40% weight-BW at 128-1024 tokens)
timeout 3000 python benchmark/fused_moe/bench_fused_moe.py \
  --models qwen3_235b hunyuan_v3 deepseek_v3 \
  --tokens 4 16 64 128 256 1024 2048 4096 --dtype int8 \
  --jsonl results/moe_r3.jsonl
timeout 2400 python benchmark/fused_moe/bench_fused_moe.py \
  --models qwen3_235b deepseek_v3 --tokens 1024 4096 --dtype int8 \
  --blockwise --jsonl results/moe_r3_bw.jsonl
timeout 2400 python benchmark/fused_moe/bench_fused_moe.py \
  --models qwen3_235b --tokens 1024 4096 --dtype int8 --stages \
  --jsonl results/moe_r3_stages.jsonl

# 3. Decode: the reference's FULL scenario grid incl. skewed_extreme /
#    one_128k_31x4k / two_32k_30x4k, GQA 4 AND 8 (VERDICT #6)
timeout 3600 python benchmark/attention_decode/bench_attention_decode.py \
  --cases uniform_512 uniform_4096 skewed_mix skewed_extreme \
          one_64k_31x4k one_128k_31x4k two_32k_30x4k \
  --methods grid --dtypes bf16 int8_nhd \
  --jsonl results/decode_r3.jsonl
timeout 2400 python benchmark/attention_decode/bench_attention_decode.py \
  --cases uniform_512 uniform_4096 skewed_mix --methods grid \
  --dtypes bf16 int8_nhd --gqa 8 --kv-heads 4 \
  --jsonl results/decode_r3_gqa8.jsonl

# 4. Sampler at reference scale: batch 1..512 x vocab 120832, chained
#    timing (VERDICT #8)
timeout 2400 python benchmark/sampler/bench_sampler.py \
  --jsonl results/sampler_r3.jsonl

# 5. RoPE store rows (suspect r2 rows superseded)
timeout 2400 python benchmark/rope_norm_store_kv/bench_rope.py \
  --impls xla pallas --jsonl results/rope_r3.jsonl

# 6. Prefill: dense + tuned splash baseline + sparse (random & stem) at
#    batch shapes (VERDICT #1/#4)
timeout 3600 python benchmark/attention_prefill/bench_attention_prefill.py \
  --cases b8_2k b2_8k b1_32k --stem --jsonl results/prefill_r3_full.jsonl

# 7. Headline bench reproducibility (3 runs)
for i in 1 2 3; do timeout 580 python bench.py; done
