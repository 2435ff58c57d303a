"""Grouped GEMM FP8 benchmark (per-tensor and blockwise scales).

Mirrors the reference's group-GEMM benches (README 1.1x/1.88x vs DeepGEMM):
varlen expert groups [total_seq, K] x [G, N, K] -> bf16. Reports achieved
TFLOP/s vs the chip's 8-bit matmul peak and a dense-XLA bf16 baseline doing
the same FLOPs (upper bound for a non-grouped kernel).

Usage: python benchmark/group_gemm/bench_group_gemm.py --csv gg.csv
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

from common import (
    Reporter, peak_bf16_tflops, peak_int8_tflops, time_chain, time_fn,
)

# (groups, avg_rows_per_group, N, K)
SHAPES = [
    (8, 128, 4096, 7168),
    (16, 64, 2048, 7168),
    (32, 256, 1536, 4096),
    (128, 16, 512, 4096),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--schemes",
        nargs="*",
        default=["pertensor", "int8", "blockwise", "blockwise_int8"],
    )
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--inner", type=int, default=8,
                    help="chained iterations per timing sample")
    ap.add_argument("--csv", default=None)
    ap.add_argument("--jsonl", default=None)
    args = ap.parse_args()

    from hpc_ops_tpu.ops.group_gemm import (
        group_gemm_blockwise_fp8,
        group_gemm_blockwise_int8,
        group_gemm_pertensor_fp8,
        group_gemm_pertensor_int8,
    )

    rep = Reporter(csv_path=args.csv, jsonl_path=args.jsonl)
    rng = np.random.default_rng(41)
    fp8 = jnp.float8_e4m3fn

    for g_num, avg, n, k in SHAPES:
        lens = rng.poisson(avg, g_num).astype(np.int64) + 1
        total = int(lens.sum())
        kx, kw = jax.random.split(jax.random.PRNGKey(g_num))
        x = (jax.random.normal(kx, (total, k)) / 8).astype(fp8)
        w = (jax.random.normal(kw, (g_num, n, k)) / 8).astype(fp8)
        seqlens = jnp.asarray(lens, jnp.int32)
        cu = jnp.asarray(
            np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        )
        flops = 2 * total * n * k

        x_i8 = jax.random.randint(kx, (total, k), -127, 127, jnp.int8)
        w_i8 = jax.random.randint(kw, (g_num, n, k), -127, 127, jnp.int8)

        for scheme in args.schemes:
            if scheme == "pertensor":
                ys = jnp.ones((g_num,), jnp.float32)
                xx, ww = x, w
                fn = lambda x, w, sl, cu: group_gemm_pertensor_fp8(  # noqa: E731
                    x, w, sl, cu, ys
                )
            elif scheme == "int8":
                # native s8 x s8 -> s32 MXU path (~1.4x bf16 peak on v5e)
                ys = jnp.full((g_num,), 1e-4, jnp.float32)
                xx, ww = x_i8, w_i8
                fn = lambda x, w, sl, cu: group_gemm_pertensor_int8(  # noqa: E731
                    x, w, sl, cu, ys
                )
            elif scheme == "blockwise_int8":
                xs = jnp.ones((total, k // 128), jnp.float32)
                ws = jnp.ones((g_num, n // 128, -(-k // 128)), jnp.float32)
                xx, ww = x_i8, w_i8
                fn = lambda x, w, sl, cu: group_gemm_blockwise_int8(  # noqa: E731
                    x, w, sl, cu, xs, ws, x_scale_layout="natural"
                )
            else:
                xs = jnp.ones((total, k // 128), jnp.float32)
                ws = jnp.ones((g_num, n // 128, -(-k // 128)), jnp.float32)
                xx, ww = x, w
                fn = lambda x, w, sl, cu: group_gemm_blockwise_fp8(  # noqa: E731
                    x, w, sl, cu, xs, ws, x_scale_layout="natural"
                )
            try:
                # chained differential timing: feed a data-dependent (but
                # value-preserving at iteration 1) perturbation of x so XLA
                # cannot fold the repeats (see time_chain docstring)
                # weights ride in the carry: a closed-over 100MB+ weight
                # becomes a jit constant and blows the remote-compile
                # request size (HTTP 413 at 128 groups)
                def body(carry, fn=fn):
                    xc, ww, sl, cu = carry
                    out = fn(xc, ww, sl, cu)
                    # FULL-reduction dependency: an element-sliced dep
                    # (out[0,0]) lets XLA slice-simplify jnp stages — a
                    # sliced matmul folds to one dot-row (observed: the
                    # dense baseline reading 25x the MXU peak)
                    dep = (jnp.max(out).astype(jnp.float32) > 1e30).astype(
                        jnp.int32
                    )
                    if xc.dtype == jnp.int8:
                        xn = (xc.astype(jnp.int32) + dep).astype(jnp.int8)
                    else:
                        xn = (
                            xc.astype(jnp.float32) + dep.astype(jnp.float32)
                        ).astype(xc.dtype)
                    return (xn, ww, sl, cu)

                # int8 schemes run the s8 MXU at ~2x bf16 rate — use the
                # int8 peak for the signal hint so inner isn't undersized
                peak_tf = (
                    peak_int8_tflops() if "int8" in scheme
                    else peak_bf16_tflops()
                )
                sec = time_chain(
                    body, (xx, ww, seqlens, cu),
                    inner=args.inner, trials=max(args.iters // 2, 3),
                    hint_sec=flops / (peak_tf * 1e12),
                )
            except Exception as exc:  # pragma: no cover
                rep.add(bench="group_gemm", scheme=scheme, groups=g_num,
                        error=str(exc)[:120])
                continue
            rep.add(
                _time=sec,
                bench="group_gemm",
                scheme=scheme,
                groups=g_num,
                total_rows=total,
                n=n,
                k=k,
                latency_us=round(sec * 1e6, 1),
                tflops=round(flops / sec / 1e12, 2),
                frac_peak=round(flops / sec / 1e12 / peak_tf, 4),
            )

        # dense-XLA bf16 upper-bound baseline: one [total,K]x[K,N] matmul
        xb = x.astype(jnp.bfloat16)
        wb = w[0].astype(jnp.bfloat16).T

        def dense_body(carry, wb=wb):
            a, w_ = carry
            y = a @ w_
            # max over the FULL product — y[0,0] let XLA rewrite the matmul
            # to a single dot-row (5000+ "TFLOP/s" rows)
            dep = (jnp.max(y).astype(jnp.float32) > 1e30).astype(
                jnp.bfloat16
            )
            return (a + dep, w_)

        sec_b = time_chain(
            dense_body, (xb, wb),
            inner=args.inner, trials=max(args.iters // 2, 3),
            hint_sec=flops / (peak_bf16_tflops() * 1e12),
        )
        rep.add(
            _time=sec_b,
            bench="group_gemm", scheme="dense_bf16_xla", groups=g_num,
            total_rows=total, n=n, k=k,
            latency_us=round(sec_b * 1e6, 1),
            tflops=round(flops / sec_b / 1e12, 2),
        )
    rep.flush()


if __name__ == "__main__":
    main()
