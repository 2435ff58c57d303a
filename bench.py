"""Headline benchmark: paged decode-attention bandwidth vs HBM roofline.

Mirrors the reference's flagship decode-attention benchmark scenarios
(benchmark/attention_decode/README.md `uniform_4096`: 64 requests x 4K KV)
and the BASELINE.json target (>=85% of HBM roofline on decode attention).

Prints ONE JSON line: value = achieved HBM bandwidth (GB/s) of the decode
attention kernel; vs_baseline = fraction of the chip's published peak HBM
bandwidth (v5e: 819 GB/s), so vs_baseline >= 0.85 meets the target.

Timing: median over replays after warmup, jax.block_until_ready (the TPU
analog of the reference's CUDA-graph + Nsight median methodology,
benchmark/fused_moe/worker.py:33-50).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

PEAK_HBM_GBPS = {
    "TPU v5 lite": 819.0,  # v5e
    "TPU v5": 2765.0,  # v5p
    "TPU v4": 1228.0,
}


def peak_bw() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in PEAK_HBM_GBPS.items():
        if kind.startswith(k):
            return v
    return 819.0


def bench_decode_attention(b=64, kv_len=4096, hkv=8, g=4, d=128, page=64, dtype=jnp.bfloat16):
    from hpc_ops_tpu.ops.attention.decode import attention_decode

    rng = np.random.RandomState(0)
    hq = hkv * g
    nb_per = kv_len // page
    nb = b * nb_per
    q = jnp.asarray(rng.randn(b, hq, d), jnp.bfloat16)
    k_pages = jnp.asarray(rng.randn(hkv, nb, page, d) / 8, dtype)
    v_pages = jnp.asarray(rng.randn(hkv, nb, page, d) / 8, dtype)
    block_ids = jnp.asarray(
        rng.permutation(nb).reshape(b, nb_per).astype(np.int32)
    )
    seq_lens = jnp.full((b,), kv_len, jnp.int32)

    def run():
        return attention_decode(
            q, k_pages, v_pages, block_ids, seq_lens,
            new_kv_included=True, cache_layout="HND",
        )

    out = jax.block_until_ready(run())  # compile + warmup
    jax.block_until_ready(run())

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))

    kv_bytes = 2 * b * kv_len * hkv * d * np.dtype(
        np.float16 if dtype == jnp.bfloat16 else np.int8
    ).itemsize
    gbps = kv_bytes / med / 1e9
    return gbps, med


def main():
    gbps, med = bench_decode_attention()
    peak = peak_bw()
    print(
        json.dumps(
            {
                "metric": "decode_attention_hbm_bandwidth_uniform4096_b64",
                "value": round(gbps, 2),
                "unit": "GB/s",
                "vs_baseline": round(gbps / peak, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
