"""Sweep prefill kernel tiles (tq x kv-chunk tokens) on the real TPU.

Chained differential timing per benchmark/common.time_chain semantics:
the attention call is chained inside one jit with a data dependency, and
the reported time is (t_2N - t_N) / N. Run when the axon tunnel is up:

    python exp/prefill_sweep.py [--case b1_32k] [--tqs 128 256 512]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmark"))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from common import time_chain  # noqa: E402

CASES = {
    "b8_2k": [2048] * 8,
    "b2_8k": [8192] * 2,
    "b1_32k": [32768],
}
BS, D = 64, 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", nargs="*", default=["b2_8k", "b1_32k"])
    ap.add_argument("--tqs", type=int, nargs="*", default=[128, 256, 512])
    ap.add_argument("--chunks", type=int, nargs="*", default=[1024, 2048, 4096])
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--gqa", type=int, default=4)
    ap.add_argument("--inner", type=int, default=4)
    args = ap.parse_args()

    from hpc_ops_tpu.ops.attention.prefill import attention_with_kvcache_prefill

    hkv, g = args.kv_heads, args.gqa
    hq = hkv * g
    key = jax.random.PRNGKey(0)

    for case in args.cases:
        lens = CASES[case]
        total = sum(lens)
        nb = total // BS + len(lens)
        flops = sum(4 * (L * L / 2) * hq * D for L in lens)
        k1, k2, k3 = jax.random.split(key, 3)
        q = jax.random.normal(k1, (total, hq, D), jnp.bfloat16)
        kc = jax.random.normal(k2, (hkv, nb, BS, D), jnp.bfloat16)
        vc = jax.random.normal(k3, (hkv, nb, BS, D), jnp.bfloat16)
        max_blocks = max(L // BS for L in lens)
        bid = np.zeros((len(lens), max_blocks), np.int32)
        nxt = 0
        for i, L in enumerate(lens):
            n = L // BS
            bid[i, :n] = np.arange(nxt, nxt + n)
            nxt += n
        cu = jnp.asarray(
            np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        )
        kvl = jnp.asarray(lens, jnp.int32)
        bid = jnp.asarray(bid)

        for tq in args.tqs:
            for ck in args.chunks:
                def call(qq):
                    return attention_with_kvcache_prefill(
                        qq, kc, vc, cu, bid, kvl, max(lens),
                        cache_layout="HND", tq=tq,
                        pages_per_compute_block=ck // BS,
                    )
                try:
                    t = time_chain(call, q, inner=args.inner)
                except Exception as e:  # noqa: BLE001
                    print(f"{case} tq={tq} ck={ck} FAILED: {e}")
                    continue
                tf = flops / t / 1e12
                print(
                    f"{case} tq={tq} ck={ck}: {t*1e3:.3f} ms  "
                    f"{tf:.1f} TFLOP/s ({100*tf/197:.1f}% peak)",
                    flush=True,
                )


if __name__ == "__main__":
    main()
