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

from common import Reporter, peak_bf16_tflops, time_chain

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
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
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

        flops = 2 * m * n * k
        # the split-weight GEMM runs two bf16 MXU passes
        hint = 2 * flops / (peak_bf16_tflops() * 1e12)
        trials = max(args.iters // 2, 3)

        # weights ride in the chain carry — closed-over arrays become jit
        # constants shipped through the remote-compile tunnel
        def fused_body(carry):
            xc, h_, l_ = carry
            y = gemm_bf16xfp32(xc, h_, l_, scale)
            # full-reduction dep: y[0,0] lets XLA fold a matmul to one
            # dot-row (see bench_group_gemm)
            dep = (jnp.max(y).astype(jnp.float32) > 1e30).astype(xc.dtype)
            return (xc + dep, h_, l_)

        t_fused = time_chain(
            fused_body, (x, w_high, w_low),
            inner=args.inner, trials=trials, hint_sec=hint,
        )

        # honest fp32 baseline: force full-precision accumulation — this
        # environment sets --xla_allow_excess_precision, which would silently
        # demote a plain f32 matmul to one bf16 pass
        def base_body(carry):
            xc, w_ = carry
            y = jax.lax.dot_general(
                xc, w_, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
            dep = (jnp.max(y) > 1e30).astype(xc.dtype)
            return (xc + dep, w_)

        t_base = time_chain(
            base_body, (xf, w32), inner=args.inner, trials=trials,
            hint_sec=3 * hint,
        )
        rep.add(
            _time=t_fused,
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
