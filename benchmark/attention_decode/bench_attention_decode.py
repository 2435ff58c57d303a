"""Attention decode benchmark — dynamic-scheduling scenarios.

Mirrors the reference's flagship bench
(benchmark/attention_decode/bench_attention_decode_bf16.py and README
scenarios): mixed KV-length batches stressing the scheduler, BF16 and FP8
caches, grid-mode ("static") vs task-map ("dynamic") execution. Latency is
microseconds per operator call (median of replays); bandwidth is achieved
HBM GB/s over the KV bytes actually read.

Usage:
    python benchmark/attention_decode/bench_attention_decode.py \
        --cases uniform_512 skewed_extreme --methods grid taskmap \
        --dtypes bf16 fp8 --csv out.csv --jsonl out.jsonl
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

from common import Reporter, peak_hbm_gbps, time_chain

BLOCK_SIZE = 64
HEAD_DIM = 128

# scenario name -> list of (count, kv_len); reference README "Scenario Names"
SCENARIOS = {
    "uniform_512": [(64, 512)],
    "uniform_4096": [(64, 4096)],
    "skewed_mix": [(32, 128), (32, 4096)],
    "skewed_extreme": [(1, 16384), (15, 64)],
    "one_64k_7x4k": [(1, 65536), (7, 4096)],
    "one_64k_15x4k": [(1, 65536), (15, 4096)],
    "one_64k_31x4k": [(1, 65536), (31, 4096)],
    "one_128k_31x4k": [(1, 131072), (31, 4096)],
    "two_32k_30x4k": [(2, 32768), (30, 4096)],
}


def expand(case):
    lens = []
    for count, kv in SCENARIOS[case]:
        lens += [kv] * count
    return np.asarray(lens, np.int64)


def build_inputs(kv_lens, hkv, g, dtype, rng):
    b = len(kv_lens)
    hq = hkv * g
    max_blocks = int(np.max(kv_lens)) // BLOCK_SIZE
    nb_per = np.maximum(kv_lens // BLOCK_SIZE, 1)
    total_blocks = int(nb_per.sum())
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(b), 3)
    # generate on-device: host->device copies can be very slow
    q = jax.random.normal(kq, (b, hq, HEAD_DIM), jnp.bfloat16)
    k = jax.random.normal(kk, (hkv, total_blocks, BLOCK_SIZE, HEAD_DIM)) / 8
    v = jax.random.normal(kv, (hkv, total_blocks, BLOCK_SIZE, HEAD_DIM)) / 8
    if dtype == "fp8":
        k_pages = (k * 16).astype(jnp.float8_e4m3fn)
        v_pages = (v * 16).astype(jnp.float8_e4m3fn)
    elif dtype in ("int8", "int8_nhd"):
        # fused int8 serving layouts (the framework's quantized fast path):
        # "int8" = head-major FUSED [H, nb, 2bs, D]; "int8_nhd" = the
        # slot-leading NHD_FUSED slab [nb, 2bs, H*D] (one DMA per page for
        # ALL heads — the engine's native layout)
        from hpc_ops_tpu.ops.quant import quantize_kv_fused_int8

        kf = k.astype(jnp.bfloat16)
        vf = v.astype(jnp.bfloat16)
        k_pages, ks, vs = quantize_kv_fused_int8(kf, vf)
        if dtype == "int8_nhd":
            from hpc_ops_tpu.ops.attention.paging import (
                pack_kv_fused_nhd,
                unpack_kv_fused,
            )

            k_pages = pack_kv_fused_nhd(*unpack_kv_fused(k_pages))
        v_pages = (ks, vs)  # carried to the caller via the v slot
    else:
        k_pages = k.astype(jnp.bfloat16)
        v_pages = v.astype(jnp.bfloat16)
    # contiguous block table, padded with zeros up to max_blocks per request
    tbl = np.zeros((b, max_blocks), np.int32)
    start = 0
    for i, nbp in enumerate(nb_per):
        tbl[i, :nbp] = np.arange(start, start + nbp, dtype=np.int32)
        start += nbp
    block_ids = jnp.asarray(tbl)
    seq_lens = jnp.asarray(kv_lens, jnp.int32)
    kv_bytes = (  # PHYSICAL bytes (itemsize 1 for 8-bit caches)
        2
        * int(kv_lens.sum())
        * hkv
        * HEAD_DIM
        * (1 if dtype in ("fp8", "int8", "int8_nhd") else 2)
    )
    return q, k_pages, v_pages, block_ids, seq_lens, kv_bytes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", nargs="*", default=list(SCENARIOS))
    ap.add_argument("--methods", nargs="*", default=["grid", "taskmap"])
    ap.add_argument(
        "--dtypes", nargs="*", default=["bf16", "fp8", "int8"],
        help="bf16 | fp8 | int8 (head-major FUSED) | int8_nhd (NHD_FUSED)",
    )
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--gqa", type=int, default=4)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--inner", type=int, default=10)
    ap.add_argument("--task-tile", type=int, default=2048)
    ap.add_argument("--csv", default=None)
    ap.add_argument("--jsonl", default=None)
    ap.add_argument(
        "--trace", default=None, metavar="DIR",
        help="also capture a jax.profiler trace of each timed config into "
        "DIR for XProf device-time attribution (the nsys/NVTX analog; may "
        "be unavailable through some tunneled attachments)",
    )
    args = ap.parse_args()

    from hpc_ops_tpu.ops.attention.decode import attention_decode
    from hpc_ops_tpu.ops.attention.scheduler import assign_attention_decode_task

    rep = Reporter(csv_path=args.csv, jsonl_path=args.jsonl)
    peak = peak_hbm_gbps()
    rng = np.random.default_rng(41)

    for case in args.cases:
        kv_lens = expand(case)
        for dtype in args.dtypes:
            q, kp, vp, block_ids, seq_lens, kv_bytes = build_inputs(
                kv_lens, args.kv_heads, args.gqa, dtype, rng
            )
            if dtype in ("int8", "int8_nhd"):
                kp, (ks, vs) = kp, vp
                kw = dict(
                    new_kv_included=True,
                    cache_layout="FUSED" if dtype == "int8" else "NHD_FUSED",
                    kscale=ks, vscale=vs,
                )
                vp = None
            else:
                kw = dict(new_kv_included=True, cache_layout="HND")
                if dtype == "fp8":
                    kw.update(
                        qscale=None,
                        kscale=jnp.float32(1 / 16.0),
                        vscale=jnp.float32(1 / 16.0),
                    )
            for method in args.methods:
                if method == "taskmap" and dtype in ("int8", "int8_nhd"):
                    # the task kernel consumes split pages; unpacking the
                    # fused layout per call would time the copy, not the op
                    continue
                if method == "taskmap":
                    tm = assign_attention_decode_task(
                        np.asarray(seq_lens),
                        num_head_kv=args.kv_heads,
                        tile=args.task_tile,
                        capacity="tight",  # sentinel tasks burn grid steps
                        impl="np",
                    )
                    kw_m = dict(task_map=tm, task_tile=args.task_tile, **kw)
                else:
                    kw_m = kw

                # caches travel in the chain carry: closed-over arrays
                # become jit constants and blow the remote-compile request
                # size (HTTP 413) on big scenarios
                if vp is None:
                    def body(carry, kw_m=kw_m):
                        q_c, kp_c, bi, sl = carry
                        out = attention_decode(q_c, kp_c, None, bi, sl, **kw_m)
                        return (
                            out.astype(q_c.dtype).reshape(q_c.shape),
                            kp_c, bi, sl,
                        )

                    init = (q, kp, block_ids, seq_lens)
                else:
                    def body(carry, kw_m=kw_m):
                        q_c, kp_c, vp_c, bi, sl = carry
                        out = attention_decode(q_c, kp_c, vp_c, bi, sl, **kw_m)
                        return (
                            out.astype(q_c.dtype).reshape(q_c.shape),
                            kp_c, vp_c, bi, sl,
                        )

                    init = (q, kp, vp, block_ids, seq_lens)

                try:
                    sec = time_chain(
                        body, init,
                        inner=args.inner, trials=max(args.iters // 2, 3),
                        hint_sec=kv_bytes / (peak * 1e9),
                    )
                except Exception as exc:
                    rep.add(bench="attention_decode", case=case, dtype=dtype,
                            method=method, error=str(exc)[:160])
                    continue
                if args.trace:
                    from common import trace_fn

                    trace_fn(
                        lambda c: body(c),
                        (init,),
                        f"{args.trace}/{case}_{dtype}_{method}",
                    )
                gbps = kv_bytes / sec / 1e9
                eff = (
                    kv_bytes * (2 if dtype in ("fp8", "int8", "int8_nhd") else 1)
                    / sec / 1e9
                )
                rep.add(
                    _time=sec,
                    bench="attention_decode",
                    case=case,
                    dtype=dtype,
                    method=method,
                    batch=len(kv_lens),
                    kv_heads=args.kv_heads,
                    gqa=args.gqa,
                    latency_us=round(sec * 1e6, 1),
                    hbm_gbps=round(gbps, 1),
                    effective_gbps=round(eff, 1),
                    frac_of_peak=round(gbps / peak, 4),
                    # physical bytes/s above the HBM spec is impossible:
                    # the row is an estimator artifact (burst interference
                    # swallowing part of the differential signal)
                    **({"suspect": True} if gbps > 1.05 * peak else {}),
                )
    rep.flush()


if __name__ == "__main__":
    main()
