"""RoPE + QK-norm + KV-cache store benchmark (BF16 and FP8 paths).

Mirrors benchmark/rope_norm_store_kv in the reference: decode-shaped calls
(one new token per request) and prefill-shaped calls. The op is pure
bandwidth; reports achieved GB/s over bytes moved (qkv read + q write + KV
page writes).

Usage: python benchmark/rope_norm_store_kv/bench_rope.py --csv rope.csv
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

from common import Reporter, peak_hbm_gbps, time_fn

D = 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", nargs="*", type=int, default=[8, 64, 256])
    ap.add_argument("--q-heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--csv", default=None)
    ap.add_argument("--jsonl", default=None)
    ap.add_argument(
        "--impls", nargs="*", default=["xla", "pallas"],
        help="rope_norm_store_kv impl= values to sweep",
    )
    args = ap.parse_args()

    from hpc_ops_tpu.ops.rope import make_cos_sin_cache, rope_norm_store_kv

    rep = Reporter(csv_path=args.csv, jsonl_path=args.jsonl)
    hq, hkv = args.q_heads, args.kv_heads
    bs = 64
    cos_sin = make_cos_sin_cache(8192, D)

    for b in args.batches:
        rows = b  # decode: one token per request
        qkv = jax.random.normal(
            jax.random.PRNGKey(0), (rows, (hq + 2 * hkv) * D), jnp.bfloat16
        )
        nb = 4 * b
        kc = jnp.zeros((nb, bs, hkv, D), jnp.bfloat16)
        vc = jnp.zeros((nb, bs, hkv, D), jnp.bfloat16)
        seq = jnp.full((b,), 100, jnp.int32)
        q_index = jnp.arange(b + 1, dtype=jnp.int32)
        tbl = jnp.asarray(
            np.arange(nb, dtype=np.int32).reshape(b, 4)
        )
        # chain calls inside one jit with the cache as loop carry — the
        # realistic serving pattern (in-place cache updates); separate
        # dispatches pay a full functional cache copy per call. The op is
        # tens of µs, so the inner chain must be long enough for the 2N-N
        # differential to clear this host's ±ms readback noise.
        import time as _t
        # the op is ~5-35µs depending on batch: size the chain so the 2N-N
        # differential signal is ~20ms (well above the bursty ±ms readback
        # noise; at inner=50 the b=8 rows measured as 0.0µs)
        inner = max(50, 20000 // b)

        def mk(n, impl):
            @jax.jit
            def run(kc, vc, qkv, cs, seq, qi, tbl):
                def body(_, carry):
                    kc_, vc_ = carry
                    _q, kc2, vc2 = rope_norm_store_kv(
                        kc_, vc_, qkv, cs, seq, qi, tbl, False,
                        zero_tails=False, impl=impl,
                    )
                    return (kc2, vc2)
                return jax.lax.fori_loop(0, n, body, (kc, vc))[0]
            return run

        for impl in args.impls:
            runs = {n: mk(n, impl) for n in (inner, 2 * inner)}
            a = (kc, vc, qkv, cos_sin, seq, q_index, tbl)
            for r in runs.values():
                np.asarray(r(*a)[:1, :1, :1, :4])
            samples = {n: [] for n in runs}
            for _ in range(args.iters):
                for n, r in runs.items():
                    t0 = _t.perf_counter()
                    np.asarray(r(*a)[:1, :1, :1, :4])
                    samples[n].append(_t.perf_counter() - t0)
            # difference of MINIMA (not medians): bursty interference
            # inflates random trials; the min is the clean run
            diff = (min(samples[2 * inner]) - min(samples[inner])) / inner
            suspect = diff <= 0
            # never emit a 0/negative latency (round-2 shipped a
            # latency_us=0.0 / frac_peak=1920 row from exactly this clamp):
            # fall back to the 2N-chain upper bound and mark the row
            sec = diff if diff > 0 else min(samples[2 * inner]) / (2 * inner)
            bytes_moved = (
                rows * (hq + 2 * hkv) * D * 2  # qkv read
                + rows * hq * D * 2  # q write
                + rows * 2 * hkv * D * 2  # kv page writes
            )
            rep.add(
                bench="rope_norm_store_kv", mode="decode", batch=b,
                impl=impl,
                latency_us=round(sec * 1e6, 1),
                gbps=round(bytes_moved / sec / 1e9, 2),
                frac_peak=round(bytes_moved / sec / 1e9 / peak_hbm_gbps(), 4),
                **({"suspect": True,
                    "suspect_reason": "nonpositive_differential"}
                   if suspect else {}),
            )
    rep.flush()


if __name__ == "__main__":
    main()
