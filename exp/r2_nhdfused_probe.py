"""TPU validation for the NHD_FUSED serving layout.

1. decode: attention_decode(cache_layout="NHD_FUSED") vs "FUSED" on the
   same quantized pages — must agree bitwise-ish (same math, same order).
2. store: rope_norm_store_kv_int8(cache_layout="NHD_FUSED", impl="pallas")
   vs impl="xla" — the compiled Pallas store fast path.
3. engine: one prefill + a few decode steps of the int8 tiny model,
   batch-vs-solo token equality.
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

ok = True


def check(name, a, b, tol):
    global ok
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    err = np.abs(a - b).max()
    good = err <= tol
    ok &= good
    print(f"{name}: max_err={err:.5f} {'OK' if good else 'FAIL'}", flush=True)


def decode_case():
    from hpc_ops_tpu.ops.attention.decode import attention_decode
    from hpc_ops_tpu.ops.attention.paging import (
        pack_kv_fused_nhd,
        unpack_kv_fused,
    )
    from hpc_ops_tpu.ops.quant import quantize_kv_fused_int8

    hkv, g, d, bs = 4, 4, 128, 16
    kv_lens = np.asarray([100, 37, 260, 1100, 40, 512, 64, 3], np.int64)
    b = len(kv_lens)
    max_blocks = int(np.max((kv_lens + bs - 1) // bs))
    nb = int(((kv_lens + bs - 1) // bs).sum()) + 1
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(kq, (b, hkv * g, d), jnp.bfloat16)
    k = jax.random.normal(kk, (hkv, nb, bs, d), jnp.bfloat16) / 8
    v = jax.random.normal(kv, (hkv, nb, bs, d), jnp.bfloat16) / 8
    kv_i8, ks, vs = quantize_kv_fused_int8(k, v)
    kv_nhd = pack_kv_fused_nhd(*unpack_kv_fused(kv_i8))

    tbl = np.zeros((b, max_blocks), np.int32)
    start = 0
    for i, L in enumerate(kv_lens):
        nbp = int((L + bs - 1) // bs)
        tbl[i, :nbp] = np.arange(start, start + nbp, dtype=np.int32)
        start += nbp
    block_ids = jnp.asarray(tbl)
    seq_lens = jnp.asarray(kv_lens, jnp.int32)

    kw = dict(new_kv_included=True, kscale=ks, vscale=vs)
    want = attention_decode(
        q, kv_i8, None, block_ids, seq_lens, cache_layout="FUSED", **kw
    )
    out = attention_decode(
        q, kv_nhd, None, block_ids, seq_lens, cache_layout="NHD_FUSED", **kw
    )
    check("decode.nhd_fused_vs_fused", out, want, 2e-2)

    # mtp (draft rows)
    q3 = jax.random.normal(kq, (b * 3, hkv * g, d), jnp.bfloat16)
    want = attention_decode(
        q3, kv_i8, None, block_ids, seq_lens, mtp=2,
        cache_layout="FUSED", **kw,
    )
    out = attention_decode(
        q3, kv_nhd, None, block_ids, seq_lens, mtp=2,
        cache_layout="NHD_FUSED", **kw,
    )
    check("decode.nhd_fused_mtp", out, want, 2e-2)


def store_case():
    from hpc_ops_tpu.ops.rope import rope_norm_store_kv_int8

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
    kv = jnp.zeros((nb, 2 * bs, hkv * d), jnp.int8)
    ks = jnp.asarray(0.05, jnp.float32)
    vs = jnp.asarray(0.04, jnp.float32)
    outs = {}
    for impl in ("xla", "pallas"):
        q, cache = rope_norm_store_kv_int8(
            kv, qkv, cos_sin, seqlens, q_index, tbl,
            is_prefill=False, k_scale=ks, v_scale=vs, qk_norm_policy=0,
            impl=impl, cache_layout="NHD_FUSED", num_kv_heads=hkv,
        )
        outs[impl] = (q, cache)
    check("store.q", outs["xla"][0], outs["pallas"][0], 0.02)
    check("store.kv", outs["xla"][1], outs["pallas"][1], 1.0)


def engine_case():
    from hpc_ops_tpu.models.llama import init_weights, tiny_config
    from hpc_ops_tpu.runtime.engine import Engine

    cfg = tiny_config(int8_kv=True, kv_scale=0.08)
    weights = init_weights(jax.random.PRNGKey(0), cfg)
    prompts = [[1, 5, 9, 2], [3, 3, 7], [11, 2, 4, 8, 6]]

    def run(batch):
        eng = Engine(cfg, weights, num_blocks=64, block_size=16)
        return eng.run(batch, max_new=6)

    together = run(prompts)
    solo = [run([p])[0] for p in prompts]
    same = all(t == s for t, s in zip(together, solo))
    global ok
    ok &= same
    print(f"engine.batch_vs_solo: {'OK' if same else 'FAIL'} {together}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    decode_case()
    store_case()
    engine_case()
    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)
