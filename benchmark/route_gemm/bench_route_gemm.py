"""Route GEMM (BF16xFP32) benchmark.

Mirrors benchmark/route_gemm in the reference (README.md:119-133): an
FP32-accurate GEMM from split bf16 weights, used for MoE router projections
where bf16 rounding would misroute tokens. Baseline comparison is a plain
fp32 XLA GEMM (the cuBLAS-FP32 analog on TPU) — fp32 matmuls cannot use the
MXU at full rate, which is exactly the gap the split-weight trick closes.

Usage: python benchmark/route_gemm/bench_route_gemm.py --csv route.csv
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from common import Reporter, peak_bf16_tflops, time_fn

# (m, n, k): router shapes — n = num_experts is small; include square shapes
SHAPES = [
    (256, 256, 7168),
    (4096, 256, 7168),
    (16384, 256, 7168),
    (4096, 4096, 4096),
    (8192, 8192, 8192),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--csv", default=None)
    ap.add_argument("--jsonl", default=None)
    args = ap.parse_args()

    from hpc_ops_tpu.ops.gemm import gemm_bf16xfp32, split_fp32_weight

    rep = Reporter(csv_path=args.csv, jsonl_path=args.jsonl)
    rng = np.random.default_rng(41)

    for m, n, k in SHAPES:
        kx, kw = jax.random.split(jax.random.PRNGKey(m + n))
        x = jax.random.normal(kx, (m, k), jnp.bfloat16)
        w32 = jax.random.normal(kw, (n, k), jnp.float32)
        w_high, w_low, scale = split_fp32_weight(w32)
        xf = x.astype(jnp.float32)

        t_fused = time_fn(
            lambda x, h, l, s: gemm_bf16xfp32(x, h, l, s),
            (x, w_high, w_low, scale),
            warmup=args.warmup, iters=args.iters,
        )
        # honest fp32 baseline: force full-precision accumulation — this
        # environment sets --xla_allow_excess_precision, which would silently
        # demote a plain f32 matmul to one bf16 pass
        t_base = time_fn(
            lambda xf, w: jax.lax.dot_general(
                xf, w, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            ),
            (xf, w32),
            warmup=args.warmup, iters=args.iters,
        )
        flops = 2 * m * n * k
        rep.add(
            bench="route_gemm",
            m=m, n=n, k=k,
            latency_us=round(t_fused * 1e6, 1),
            fp32_xla_us=round(t_base * 1e6, 1),
            speedup_vs_fp32=round(t_base / t_fused, 2),
            tflops=round(flops / t_fused / 1e12, 2),
            frac_peak=round(flops / t_fused / 1e12 / (peak_bf16_tflops() / 2), 4),
        )
    rep.flush()


if __name__ == "__main__":
    main()
