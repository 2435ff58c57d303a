"""Probe: decode-attention time with bf16 vs int8 vs fp8 KV cache.

Same scenario as bench.py (uniform_4096, B=64, Hkv=8, G=4, D=128, page 64).
Uses the differential-chaining timing from bench.py.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from bench import B, KV_LEN, HKV, G, D, PAGE, INNER, TRIALS, timed  # noqa: E402
from hpc_ops_tpu.ops.attention.decode import attention_decode  # noqa: E402


def build_inputs(dtype):
    hq = HKV * G
    nb_per = KV_LEN // PAGE
    nb = B * nb_per
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, hq, D), jnp.bfloat16)
    if dtype == jnp.bfloat16:
        k_pages = jax.random.normal(kk, (HKV, nb, PAGE, D), jnp.bfloat16) / 8
        v_pages = jax.random.normal(kv, (HKV, nb, PAGE, D), jnp.bfloat16) / 8
    elif dtype == jnp.int8:
        k_pages = jax.random.randint(kk, (HKV, nb, PAGE, D), -127, 127, jnp.int8)
        v_pages = jax.random.randint(kv, (HKV, nb, PAGE, D), -127, 127, jnp.int8)
    else:
        k_pages = (jax.random.normal(kk, (HKV, nb, PAGE, D), jnp.bfloat16) / 8).astype(dtype)
        v_pages = (jax.random.normal(kv, (HKV, nb, PAGE, D), jnp.bfloat16) / 8).astype(dtype)
    block_ids = jnp.asarray(
        np.random.RandomState(0).permutation(nb).reshape(B, nb_per).astype(np.int32)
    )
    seq_lens = jnp.full((B,), KV_LEN, jnp.int32)
    _ = np.asarray(q[:1, :1, :4])  # sync
    return q, k_pages, v_pages, block_ids, seq_lens


def bench_dtype(dtype, name):
    args = build_inputs(dtype)
    kw = {}
    if dtype != jnp.bfloat16:
        kw = dict(
            kscale=jnp.full((1,), 0.01, jnp.float32),
            vscale=jnp.full((1,), 0.01, jnp.float32),
        )

    def make(n):
        def run_n(q, k_pages, v_pages, block_ids, seq_lens):
            def body(_, q_c):
                out = attention_decode(
                    q_c, k_pages, v_pages, block_ids, seq_lens,
                    new_kv_included=True, cache_layout="HND", **kw,
                )
                return out.astype(q_c.dtype).reshape(q_c.shape)

            return jax.lax.fori_loop(0, n, body, q)

        return run_n

    t = timed(make, args)
    itemsize = 2 if dtype == jnp.bfloat16 else 1
    phys = 2 * B * KV_LEN * HKV * D * itemsize
    logical = 2 * B * KV_LEN * HKV * D * 2
    print(
        f"{name}: {t*1e6:.1f} us/call  phys {phys/t/1e9:.1f} GB/s  "
        f"effective(bf16-equiv) {logical/t/1e9:.1f} GB/s",
        flush=True,
    )
    return t


t_bf16 = bench_dtype(jnp.bfloat16, "bf16")
t_int8 = bench_dtype(jnp.int8, "int8")
t_fp8 = bench_dtype(jnp.float8_e4m3fn, "fp8 ")
print(f"int8 speedup vs bf16: {t_bf16/t_int8:.2f}x ; fp8 vs bf16: {t_bf16/t_fp8:.2f}x")
