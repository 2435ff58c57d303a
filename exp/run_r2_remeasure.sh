#!/bin/bash
# Round-2 re-measure with the burst-robust estimator (hint-scaled inner
# chains): the part-4 run produced physically impossible rows (>HBM-spec
# bandwidth) where the differential signal was small vs the bursty
# dispatch floor. QUIET host.
set -x
cd "$(dirname "$0")/.."

# 1. Decode scenarios (supersedes decode_nhdfused_r2.jsonl)
rm -f results/decode_r2e.jsonl
timeout 2400 python benchmark/attention_decode/bench_attention_decode.py \
  --cases uniform_512 uniform_4096 skewed_mix one_64k_31x4k one_128k_31x4k \
  --methods grid --dtypes bf16 int8 int8_nhd \
  --jsonl results/decode_r2e.jsonl

# 2. RoPE store (batch-scaled inner; supersedes rope_r2.jsonl b<=64 rows)
rm -f results/rope_r2b.jsonl
timeout 1500 python benchmark/rope_norm_store_kv/bench_rope.py \
  --impls xla pallas --jsonl results/rope_r2b.jsonl

# 3. Headline bench x3 at INNER=64
for i in 1 2 3; do timeout 580 python bench.py; done

echo "REMEASURE DONE"
