#!/bin/bash
# Round-5 measurement queue (run serially — one TPU).
set -x
cd /root/repo

# 1. Full decode scenario grid (all 9 reference scenarios), GQA 4 + GQA 8
timeout 7200 python benchmark/attention_decode/bench_attention_decode.py \
  --dtypes bf16 int8 --gqa 4 --jsonl results/decode_r5.jsonl \
  --csv /tmp/decode_r5.csv
timeout 5400 python benchmark/attention_decode/bench_attention_decode.py \
  --cases uniform_4096 one_64k_31x4k --dtypes bf16 int8 --gqa 8 \
  --jsonl results/decode_r5_gqa8.jsonl --csv /tmp/decode_r5_gqa8.csv

# 2. Sampler reference-scale sweep (batch 1..512 x vocab 120832)
timeout 3600 python benchmark/sampler/bench_sampler.py \
  --jsonl results/sampler_r5.jsonl --csv /tmp/sampler_r5.csv

# 3. MoE: per-tensor int8 with stage attribution, then blockwise
timeout 5400 python benchmark/fused_moe/bench_fused_moe.py \
  --models qwen3_235b deepseek_v3 --tokens 128 1024 4096 --dtype int8 \
  --stages --jsonl results/moe_r5.jsonl --csv /tmp/moe_r5.csv
timeout 5400 python benchmark/fused_moe/bench_fused_moe.py \
  --models qwen3_235b deepseek_v3 --tokens 1024 4096 --dtype int8 \
  --blockwise --jsonl results/moe_r5_bw.jsonl --csv /tmp/moe_r5_bw.csv

# 4. Full prefill suite with sparse + stem net numbers (final kernel)
timeout 7200 python benchmark/attention_prefill/bench_attention_prefill.py \
  --skip-splash --stem \
  --jsonl results/prefill_r5c.jsonl --csv /tmp/prefill_r5c.csv

echo ALL_DONE
