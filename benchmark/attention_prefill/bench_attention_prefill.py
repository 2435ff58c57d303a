"""Attention prefill benchmark (dense varlen, paged-cache, block-sparse).

Mirrors the reference's prefill benches: varlen batches, causal GQA,
head_dim 128; the sparse rows report speedup of block-sparse over dense at
a given keep-ratio (reference README: 3.16x at ~0.2 density on 32K).

Usage: python benchmark/attention_prefill/bench_attention_prefill.py
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

BLOCK_SIZE = 64
HEAD_DIM = 128

CASES = {
    # name -> list of q/kv lens (q == kv: fresh prefill)
    "b8_2k": [2048] * 8,
    "b2_8k": [8192] * 2,
    "b1_32k": [32768],
    "mix_4k_16k": [4096, 4096, 16384],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", nargs="*", default=list(CASES))
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--gqa", type=int, default=4)
    ap.add_argument("--sparse-keep", type=float, default=0.2)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--csv", default=None)
    ap.add_argument("--jsonl", default=None)
    args = ap.parse_args()

    from hpc_ops_tpu.ops.attention.prefill import (
        attention_with_kvcache_blocksparse_prefill_fp8,
        attention_with_kvcache_prefill_bf16,
    )

    rep = Reporter(csv_path=args.csv, jsonl_path=args.jsonl)
    rng = np.random.default_rng(41)
    hkv, g = args.kv_heads, args.gqa
    hq = hkv * g

    for case in args.cases:
        lens = np.asarray(CASES[case], np.int64)
        b = len(lens)
        total_q = int(lens.sum())
        max_q = int(lens.max())
        nb_per = -(-lens // BLOCK_SIZE)
        total_blocks = int(nb_per.sum())
        max_blocks = int(nb_per.max())

        kq, kk, kv = jax.random.split(jax.random.PRNGKey(b), 3)
        q = jax.random.normal(kq, (total_q, hq, HEAD_DIM), jnp.bfloat16)
        kc = (
            jax.random.normal(kk, (total_blocks, BLOCK_SIZE, hkv, HEAD_DIM)) / 8
        ).astype(jnp.bfloat16)
        vc = (
            jax.random.normal(kv, (total_blocks, BLOCK_SIZE, hkv, HEAD_DIM)) / 8
        ).astype(jnp.bfloat16)
        cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]).astype(np.int32))
        tbl = np.zeros((b, max_blocks), np.int32)
        start = 0
        for i, nbp in enumerate(nb_per):
            tbl[i, :nbp] = np.arange(start, start + nbp, dtype=np.int32)
            start += nbp
        block_ids = jnp.asarray(tbl)
        seq_kv = jnp.asarray(lens, jnp.int32)

        fn = lambda q, kc, vc, cu, bi, skv: (  # noqa: E731
            attention_with_kvcache_prefill_bf16(q, kc, vc, cu, bi, skv, max_q)
        )
        sec = time_fn(
            fn, (q, kc, vc, cu, block_ids, seq_kv),
            warmup=args.warmup, iters=args.iters,
        )
        # causal flops: 2 ops (qk + pv) * 2 flops, ~half the square
        flops = sum(2 * 2 * int(l) * int(l) * hq * HEAD_DIM / 2 for l in lens)
        rep.add(
            bench="attention_prefill", case=case, dtype="bf16", mode="dense",
            batch=b, total_q=total_q,
            latency_us=round(sec * 1e6, 1),
            tflops=round(flops / sec / 1e12, 2),
            frac_peak=round(flops / sec / 1e12 / peak_bf16_tflops(), 4),
        )

        # external baseline: JAX's production splash-attention kernel on
        # the same shapes (non-paged packed MHA, causal) — the strongest
        # available stock TPU prefill kernel (reference benches against
        # FlashInfer/FA3 the same way, README.md:171)
        if len(set(lens.tolist())) == 1:
            try:
                from jax.experimental.pallas.ops.tpu.splash_attention import (
                    splash_attention_kernel as sak,
                    splash_attention_mask as sam,
                )

                L = int(lens[0])
                qs = jnp.transpose(
                    q.reshape(b, L, hq, HEAD_DIM), (0, 2, 1, 3)
                )
                ks_ = jnp.transpose(
                    kc.reshape(b, L, hkv, HEAD_DIM), (0, 2, 1, 3)
                )
                vs_ = jnp.transpose(
                    vc.reshape(b, L, hkv, HEAD_DIM), (0, 2, 1, 3)
                )
                mask = sam.MultiHeadMask(
                    [sam.CausalMask((L, L)) for _ in range(hq)]
                )
                kernel = sak.make_splash_mqa_single_device(
                    mask=sam.MultiHeadMask(
                        [sam.CausalMask((L, L)) for _ in range(hkv)]
                    )
                )

                def splash_fn(qs, ks_, vs_):
                    qg = qs.reshape(b, hkv, g, L, HEAD_DIM)
                    outs = []
                    for bi_ in range(b):
                        outs.append(
                            jax.vmap(kernel)(
                                qg[bi_] * (HEAD_DIM ** -0.5), ks_[bi_], vs_[bi_]
                            )
                        )
                    return jnp.stack(outs)

                sec_b = time_fn(
                    splash_fn, (qs, ks_, vs_),
                    warmup=args.warmup, iters=args.iters,
                )
                rep.add(
                    bench="attention_prefill", case=case, dtype="bf16",
                    mode="baseline_splash", batch=b, total_q=total_q,
                    latency_us=round(sec_b * 1e6, 1),
                    tflops=round(flops / sec_b / 1e12, 2),
                    ours_vs_splash=round(sec_b / sec, 3),
                )
            except Exception as exc:
                rep.add(bench="attention_prefill", case=case,
                        mode="baseline_splash", error=str(exc)[:160])

        # block-sparse fp8: causal diagonal + random keep
        kc8 = kc.astype(jnp.float8_e4m3fn)
        vc8 = vc.astype(jnp.float8_e4m3fn)
        tile_m = 128
        n_tm = -(-max_q // tile_m)
        # one mask per KV head, shared by its GQA group (heads of one group
        # attend the same KV pages; uncorrelated per-q-head masks defeat the
        # union-skip and are not what Stem produces for GQA serving)
        mask_kv = rng.random((b, hkv, n_tm, max_blocks)) < args.sparse_keep
        mask = np.repeat(mask_kv, g, axis=1)
        for i, l in enumerate(lens):
            for tm_i in range(n_tm):
                diag = min((tm_i * tile_m) // BLOCK_SIZE, max_blocks - 1)
                mask[i, :, tm_i, diag] = True
                mask[i, :, tm_i, :2] = True  # attention sinks
        block_mask = jnp.asarray(mask.astype(np.uint8))
        one = jnp.ones((), jnp.float32)
        qs = jnp.ones((b, hq, max_q), jnp.float32)
        q8 = q.astype(jnp.float8_e4m3fn)

        fn_sparse = lambda q8, kc8, vc8, cu, bi, skv, qs: (  # noqa: E731
            attention_with_kvcache_blocksparse_prefill_fp8(
                q8, kc8, vc8, qs, one, one, cu, bi, skv, max_q,
                block_mask=block_mask, mask_tile_q=128,
                mask_tile_kv=BLOCK_SIZE,
            )
        )
        try:
            sec_sp = time_fn(
                fn_sparse, (q8, kc8, vc8, cu, block_ids, seq_kv, qs),
                warmup=args.warmup, iters=args.iters,
            )
            rep.add(
                bench="attention_prefill", case=case, dtype="fp8",
                mode=f"sparse{args.sparse_keep}", batch=b, total_q=total_q,
                latency_us=round(sec_sp * 1e6, 1),
                speedup_vs_dense=round(sec / sec_sp, 2),
            )
        except Exception as exc:  # pragma: no cover
            import traceback
            traceback.print_exc()
            rep.add(bench="attention_prefill", case=case, mode="sparse",
                    error=str(exc)[:120])
    rep.flush()


if __name__ == "__main__":
    main()
