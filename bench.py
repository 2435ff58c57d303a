"""Headline benchmark: quantized paged decode-attention vs the strongest
TPU baseline.

Scenario: the reference's flagship decode mix (benchmark/attention_decode
`uniform_4096`: 64 requests x 4K KV, GQA 4, head_dim 128) — the same
logical attention task for both sides, each side running its best
configuration:

  * baseline: JAX's production Pallas kernel
    (`jax.experimental.pallas.ops.tpu.paged_attention`), bf16 cache, swept
    over page size x compute-block size and taken at its best. There is no
    quantized-KV paged-decode kernel in stock JAX — bf16 is its best
    serving configuration.
  * ours: int8-quantized KV in the framework's native fused page layout
    (K|V of a page in one DMA slab, `cache_layout="FUSED"`), also swept.
    This mirrors the reference's own headline decode win, which is its
    quantized-cache path (README.md:172, fp8 decode up to 2.0x); on v5e
    the native 8-bit code is int8 (no hardware fp8), with per-tensor
    scales carried exactly as the reference carries fp8 scales.

Printed value = EFFECTIVE bandwidth: logical bf16-equivalent KV bytes
(2 x B x KV x Hkv x D x 2) divided by wall time — i.e. tokens served per
second, scaled; >819 GB/s (the v5e HBM spec) means the quantized cache is
serving faster than any bf16 kernel physically could. vs_baseline is the
wall-time ratio against the tuned baseline above. Accuracy of the int8
path is covered by tests/test_attention_decode.py::test_attention_decode_fused_int8
and the model-level delta rows in BENCHMARKS.md.

Timing notes (TPU behind a tunnel — see .claude/skills/verify/SKILL.md):
inputs generated on-device; kernel calls chained inside one jit via
lax.fori_loop with a real data dependency; timing = difference between
2N- and N-chains (cancels the ~30ms dispatch+readback overhead); sync via
tiny device->host readbacks (block_until_ready does not wait here).
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

B, KV_LEN, HKV, G, D = 64, 4096, 8, 4, 128
INNER = 64  # timed as the difference between 2*INNER and INNER chains;
# sized so the differential signal (INNER x ~0.7-1.3ms/call) is >=45ms —
# bursty tunnel interference has swallowed few-ms signals whole and
# produced impossible (>HBM-spec) rows at INNER=20
TRIALS = 5
LOGICAL_KV_BYTES = 2 * B * KV_LEN * HKV * D * 2  # bf16-equivalent


def build_inputs(page, dtype, layout="FUSED"):
    hq = HKV * G
    nb_per = KV_LEN // page
    nb = B * nb_per
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, hq, D), jnp.bfloat16)
    k_pages = jax.random.normal(kk, (HKV, nb, page, D), jnp.bfloat16) / 8
    v_pages = jax.random.normal(kv, (HKV, nb, page, D), jnp.bfloat16) / 8
    if dtype == jnp.int8:
        from hpc_ops_tpu.ops.quant import quantize_kv_fused_int8

        kv_fused, ks, vs = quantize_kv_fused_int8(k_pages, v_pages)
        if layout == "NHD_FUSED":
            from hpc_ops_tpu.ops.attention.paging import (
                pack_kv_fused_nhd,
                unpack_kv_fused,
            )

            kv_fused = pack_kv_fused_nhd(*unpack_kv_fused(kv_fused))
        k_pages, v_pages = kv_fused, None
        kw = dict(kscale=ks, vscale=vs)
    else:
        kw = {}
    block_ids = jnp.asarray(
        np.random.RandomState(0).permutation(nb).reshape(B, nb_per).astype(np.int32)
    )
    seq_lens = jnp.full((B,), KV_LEN, jnp.int32)
    _ = np.asarray(q[:1, :1, :4])  # sync
    return (q, k_pages, v_pages, block_ids, seq_lens), kw


def timed(make_run_n, args):
    """Per-call seconds via differential chaining (see module docstring)."""
    runs = {n: jax.jit(make_run_n(n)) for n in (INNER, 2 * INNER)}
    for f in runs.values():
        _ = np.asarray(f(*args)[:1, :1, :4])  # compile + warmup
    times = {n: [] for n in runs}
    for _ in range(TRIALS):
        for n, f in runs.items():
            t0 = time.perf_counter()
            _ = np.asarray(f(*args)[:1, :1, :4])
            times[n].append(time.perf_counter() - t0)
    # difference of MINIMA: the tunneled host sees bursty external
    # interference that inflates random trials; the min is the clean run
    # (median differencing has produced negative latencies under bursts)
    return float((min(times[2 * INNER]) - min(times[INNER])) / INNER)


def bench_ours():
    from hpc_ops_tpu.ops.attention.decode import attention_decode

    best = None
    # head-major FUSED (one DMA per page per head) and slot-leading
    # NHD_FUSED (one DMA per page for ALL heads — the serving layout)
    for page, layout in (
        (128, "FUSED"),
        (256, "FUSED"),
        (128, "NHD_FUSED"),
        (256, "NHD_FUSED"),
    ):
        args, kw = build_inputs(page, jnp.int8, layout)

        def make(n, kw=kw, layout=layout):
            def run_n(q, kv_fused, _v, block_ids, seq_lens):
                def body(_, q_c):
                    out = attention_decode(
                        q_c, kv_fused, None, block_ids, seq_lens,
                        new_kv_included=True, cache_layout=layout, **kw,
                    )
                    return out.astype(q_c.dtype).reshape(q_c.shape)

                return jax.lax.fori_loop(0, n, body, q)

            return run_n

        t = timed(make, args)
        best = t if best is None else min(best, t)
    return best


def bench_builtin():
    from jax.experimental.pallas.ops.tpu.paged_attention import paged_attention

    best = None
    for page, ppcb in ((64, 32), (64, 64), (128, 16), (128, 32)):
        args, _ = build_inputs(page, jnp.bfloat16)

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
    t_ours = bench_ours()
    t_base = bench_builtin()
    gbps = LOGICAL_KV_BYTES / t_ours / 1e9
    print(
        json.dumps(
            {
                "metric": "decode_attention_uniform4096_b64_int8kv_effective_gbps",
                "value": round(gbps, 2),
                "unit": "GB/s",
                "vs_baseline": round(t_base / t_ours, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
