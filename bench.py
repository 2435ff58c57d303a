"""Headline benchmark: paged decode-attention vs the strongest TPU baseline.

Mirrors the reference's flagship decode-attention scenario
(benchmark/attention_decode/README.md `uniform_4096`: 64 requests x 4K KV,
GQA 4, head_dim 128, page 64) and its README methodology (speedup over the
best available baseline — FlashInfer/FA3 there; JAX's built-in Pallas
`paged_attention` kernel here, tuned to its best block size).

Prints ONE JSON line: value = achieved HBM bandwidth (GB/s) of our decode
kernel; vs_baseline = our_speedup over the builtin JAX kernel (>1 = faster).

Timing notes (this matters on hosts where the TPU sits behind a tunnel):
  * inputs are generated on-device (host->device copies are slow),
  * `inner` kernel calls are chained inside one jit via lax.fori_loop with a
    real data dependency (out feeds the next q) so dispatch cost is off the
    timed path and XLA cannot fold the repeats,
  * the sync point is a tiny device->host readback — `block_until_ready`
    does not reliably wait for execution on tunneled devices,
  * arrays are jit arguments, never closed-over constants (constants get
    shipped through the remote-compile path).
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

B, KV_LEN, HKV, G, D, PAGE = 64, 4096, 8, 4, 128, 64
INNER = 20  # timed as the difference between 2*INNER and INNER chains
TRIALS = 5


def build_inputs():
    hq = HKV * G
    nb_per = KV_LEN // PAGE
    nb = B * nb_per
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, hq, D), jnp.bfloat16)
    k_pages = jax.random.normal(kk, (HKV, nb, PAGE, D), jnp.bfloat16) / 8
    v_pages = jax.random.normal(kv, (HKV, nb, PAGE, D), jnp.bfloat16) / 8
    block_ids = jnp.asarray(
        np.random.RandomState(0).permutation(nb).reshape(B, nb_per).astype(np.int32)
    )
    seq_lens = jnp.full((B,), KV_LEN, jnp.int32)
    _ = np.asarray(q[:1, :1, :4])  # sync
    return q, k_pages, v_pages, block_ids, seq_lens


def timed(make_run_n, args):
    """Per-call seconds via differential chaining: time(2N-chain) minus
    time(N-chain), divided by N. Cancels the fixed dispatch + device->host
    readback overhead (tens of ms on tunneled TPU attachments)."""
    runs = {n: jax.jit(make_run_n(n)) for n in (INNER, 2 * INNER)}
    for f in runs.values():
        _ = np.asarray(f(*args)[:1, :1, :4])  # compile + warmup
    times = {n: [] for n in runs}
    for _ in range(TRIALS):
        for n, f in runs.items():
            t0 = time.perf_counter()
            _ = np.asarray(f(*args)[:1, :1, :4])
            times[n].append(time.perf_counter() - t0)
    return float(
        (np.median(times[2 * INNER]) - np.median(times[INNER])) / INNER
    )


def bench_ours(args):
    from hpc_ops_tpu.ops.attention.decode import attention_decode

    def make(n):
        def run_n(q, k_pages, v_pages, block_ids, seq_lens):
            def body(_, q_c):
                out = attention_decode(
                    q_c, k_pages, v_pages, block_ids, seq_lens,
                    new_kv_included=True, cache_layout="HND",
                )
                return out.astype(q_c.dtype).reshape(q_c.shape)

            return jax.lax.fori_loop(0, n, body, q)

        return run_n

    return timed(make, args)


def bench_builtin(args):
    from jax.experimental.pallas.ops.tpu.paged_attention import paged_attention

    best = None
    for ppcb in (32, 64):  # give the baseline its best block size too

        def make(n, ppcb=ppcb):
            def run_n(q, k_pages, v_pages, block_ids, seq_lens):
                def body(_, q_c):
                    out = paged_attention(
                        q_c, k_pages, v_pages, seq_lens, block_ids,
                        pages_per_compute_block=ppcb,
                    )
                    return out.astype(q_c.dtype)

                return jax.lax.fori_loop(0, n, body, q)

            return run_n

        t = timed(make, args)
        best = t if best is None else min(best, t)
    return best


def main():
    args = build_inputs()
    t_ours = bench_ours(args)
    t_base = bench_builtin(args)
    kv_bytes = 2 * B * KV_LEN * HKV * D * 2
    gbps = kv_bytes / t_ours / 1e9
    print(
        json.dumps(
            {
                "metric": "decode_attention_uniform4096_b64_hbm_gbps",
                "value": round(gbps, 2),
                "unit": "GB/s",
                "vs_baseline": round(t_base / t_ours, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
