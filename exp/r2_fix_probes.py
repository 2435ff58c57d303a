"""TPU validation probes for the two round-2 lowering fixes.

1. rope_kernel.py per-token DMA: scratch (rt, hkv, d) leading-dim slices +
   integer-squeezed HBM views. Drives all three modes (NHD rows, HND
   head-major, fused int8) through the public API, Pallas vs XLA.
2. group_gemm.py _gg_scatter_kernel single_k: K=1536 (kbt=12) used to fail
   "cannot statically prove index in dimension 2 is a multiple of 8".

Run on the real TPU:  python exp/r2_fix_probes.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from hpc_ops_tpu.ops.rope import rope_norm_store_kv, rope_norm_store_kv_int8

ok = True


def check(name, a, b, tol):
    global ok
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    err = np.abs(a - b).max()
    good = err <= tol
    ok &= good
    print(f"{name}: max_err={err:.5f} {'OK' if good else 'FAIL'}", flush=True)


def rope_case(layout):
    rng = np.random.RandomState(0)
    rows, hq, hkv, d = 16, 8, 4, 128
    nb, bs = 12, 16
    nreq = rows  # decode: one token per request
    qkv = jnp.asarray(rng.randn(rows, (hq + 2 * hkv) * d) * 0.3, jnp.bfloat16)
    cos_sin = jnp.asarray(rng.randn(512, d), jnp.float32)
    seqlens = jnp.asarray(rng.randint(1, nb * bs // 2, nreq), jnp.int32)
    q_index = jnp.arange(nreq + 1, dtype=jnp.int32)  # 1 token/request
    tbl = jnp.asarray(
        rng.permutation(nb - 1)[: (nb * bs // 2) // bs + 1][None].repeat(nreq, 0),
        jnp.int32,
    )
    if layout == "HND":
        kc = jnp.zeros((hkv, nb, bs, d), jnp.bfloat16)
        vc = jnp.zeros((hkv, nb, bs, d), jnp.bfloat16)
    else:
        kc = jnp.zeros((nb, bs, hkv, d), jnp.bfloat16)
        vc = jnp.zeros((nb, bs, hkv, d), jnp.bfloat16)
    qw = jnp.asarray(1.0 + 0.1 * rng.randn(d), jnp.float32)
    kw = jnp.asarray(1.0 + 0.1 * rng.randn(d), jnp.float32)
    outs = {}
    for impl in ("xla", "pallas"):
        q, k, v = rope_norm_store_kv(
            kc, vc, qkv, cos_sin, seqlens, q_index, tbl,
            is_prefill=False, q_norm_weight=qw, k_norm_weight=kw,
            qk_norm_policy=1, cache_layout=layout,
            zero_tails=False, impl=impl, interpret=None,
        )
        outs[impl] = (q, k, v)
    for i, nm in enumerate(("q", "kcache", "vcache")):
        check(f"rope[{layout}].{nm}", outs["xla"][i], outs["pallas"][i], 0.02)


def rope_fused_int8():
    rng = np.random.RandomState(1)
    rows, hq, hkv, d = 16, 8, 4, 128
    nb, bs = 12, 16
    qkv = jnp.asarray(rng.randn(rows, (hq + 2 * hkv) * d) * 0.3, jnp.bfloat16)
    cos_sin = jnp.asarray(rng.randn(512, d), jnp.float32)
    seqlens = jnp.asarray(rng.randint(1, nb * bs // 2, rows), jnp.int32)
    q_index = jnp.arange(rows + 1, dtype=jnp.int32)
    tbl = jnp.asarray(
        rng.permutation(nb - 1)[: (nb * bs // 2) // bs + 1][None].repeat(rows, 0),
        jnp.int32,
    )
    kv = jnp.zeros((hkv, nb, 2 * bs, d), jnp.int8)
    ks = jnp.asarray(0.05, jnp.float32)
    vs = jnp.asarray(0.04, jnp.float32)
    outs = {}
    for impl in ("xla", "pallas"):
        q, cache = rope_norm_store_kv_int8(
            kv, qkv, cos_sin, seqlens, q_index, tbl,
            is_prefill=False, k_scale=ks, v_scale=vs, qk_norm_policy=0,
            impl=impl, interpret=None,
        )
        outs[impl] = (q, cache)
    check("rope_int8.q", outs["xla"][0], outs["pallas"][0], 0.02)
    check("rope_int8.kv", outs["xla"][1], outs["pallas"][1], 1.0)  # codes +-1


def gg_single_k():
    from hpc_ops_tpu.ops.moe import fuse_moe_pertensor_int8

    rng = np.random.RandomState(2)
    tokens, h, inter, e, topk = 64, 1024, 1536, 8, 2  # K=1536 -> kbt=12
    x = jnp.asarray(
        np.clip(rng.randn(tokens, h) * 30, -127, 127).round(), jnp.int8
    )
    gu = jnp.asarray(
        np.clip(rng.randn(e, 2 * inter, h) * 20, -127, 127).round(), jnp.int8
    )
    dn = jnp.asarray(
        np.clip(rng.randn(e, h, inter) * 20, -127, 127).round(), jnp.int8
    )
    gus = jnp.full((e,), 5e-5, jnp.float32)
    dns = jnp.full((e,), 5e-5, jnp.float32)
    ams = jnp.asarray(100.0, jnp.float32)
    ids = jnp.asarray(rng.randint(0, e, (tokens, topk)), jnp.int32)
    sc = jnp.asarray(rng.rand(tokens, topk), jnp.float32)
    out = fuse_moe_pertensor_int8(
        x, gu, dn, gus, dns, ams, ids, sc,
        rank_ep=0, num_expert_total=e,
    )
    v = np.asarray(out, np.float32)
    assert np.isfinite(v).all(), "non-finite MoE output"
    print(f"gg_single_k: OK out_norm={np.abs(v).mean():.4f}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    rope_case("NHD")
    rope_case("HND")
    rope_fused_int8()
    gg_single_k()
    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)
