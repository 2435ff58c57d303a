#!/bin/bash
# Round-3 remaining TPU measurement batches (GG ran separately).
set -x
cd "$(dirname "$0")/.."

# MoE: EP token sweep + hunyuan_v3 + per-stage attribution + blockwise
timeout 3600 python -u benchmark/fused_moe/bench_fused_moe.py \
  --models qwen3_235b hunyuan_v3 deepseek_v3 \
  --tokens 16 64 128 256 1024 4096 --dtype int8 \
  --jsonl results/moe_r3.jsonl
timeout 2400 python -u benchmark/fused_moe/bench_fused_moe.py \
  --models qwen3_235b deepseek_v3 --tokens 1024 4096 --dtype int8 \
  --blockwise --jsonl results/moe_r3_bw.jsonl
timeout 2400 python -u benchmark/fused_moe/bench_fused_moe.py \
  --models qwen3_235b --tokens 1024 4096 --dtype int8 --stages \
  --jsonl results/moe_r3_stages.jsonl

# Decode: full reference scenario grid + GQA-8
timeout 3600 python -u benchmark/attention_decode/bench_attention_decode.py \
  --cases uniform_512 uniform_4096 skewed_mix skewed_extreme \
          one_64k_31x4k one_128k_31x4k two_32k_30x4k \
  --methods grid --dtypes bf16 int8_nhd \
  --jsonl results/decode_r3.jsonl
timeout 2400 python -u benchmark/attention_decode/bench_attention_decode.py \
  --cases uniform_512 uniform_4096 skewed_mix --methods grid \
  --dtypes bf16 int8_nhd --gqa 8 --kv-heads 4 \
  --jsonl results/decode_r3_gqa8.jsonl

# Sampler at reference scale (batch 1..512 x vocab 120832)
timeout 2400 python -u benchmark/sampler/bench_sampler.py \
  --jsonl results/sampler_r3.jsonl

# RoPE store rows (supersede the suspect r2 rows)
timeout 2400 python -u benchmark/rope_norm_store_kv/bench_rope.py \
  --impls xla pallas --jsonl results/rope_r3.jsonl

# Route GEMM (chained timing now)
timeout 2400 python -u benchmark/route_gemm/bench_route_gemm.py \
  --jsonl results/route_r3.jsonl

# Prefill: dense + splash + sparse + stem end-to-end (fixed feed-through dep)
timeout 5400 python -u benchmark/attention_prefill/bench_attention_prefill.py \
  --cases b8_2k b2_8k b1_32k --stem --jsonl results/prefill_r3_full.jsonl

# Headline bench x3
for i in 1 2 3; do timeout 580 python bench.py; done
