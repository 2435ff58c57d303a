"""Confirm DMA-issue-boundedness: int8 decode at page sizes 64/128/256."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from bench import B, KV_LEN, HKV, G, D, timed
from hpc_ops_tpu.ops.attention.decode import attention_decode

def run(page, dtype, name):
    hq = HKV * G
    nb_per = KV_LEN // page
    nb = B * nb_per
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, hq, D), jnp.bfloat16)
    if dtype == jnp.int8:
        k_pages = jax.random.randint(kk, (HKV, nb, page, D), -127, 127, jnp.int8)
        v_pages = jax.random.randint(kv, (HKV, nb, page, D), -127, 127, jnp.int8)
        kw = dict(kscale=jnp.full((1,), 0.01, jnp.float32), vscale=jnp.full((1,), 0.01, jnp.float32))
    else:
        k_pages = jax.random.normal(kk, (HKV, nb, page, D), jnp.bfloat16) / 8
        v_pages = jax.random.normal(kv, (HKV, nb, page, D), jnp.bfloat16) / 8
        kw = {}
    block_ids = jnp.asarray(np.random.RandomState(0).permutation(nb).reshape(B, nb_per).astype(np.int32))
    seq_lens = jnp.full((B,), KV_LEN, jnp.int32)
    _ = np.asarray(q[:1, :1, :4])
    def make(n):
        def run_n(q, k_pages, v_pages, block_ids, seq_lens):
            def body(_, q_c):
                out = attention_decode(q_c, k_pages, v_pages, block_ids, seq_lens,
                                       new_kv_included=True, cache_layout="HND", **kw)
                return out.astype(q_c.dtype).reshape(q_c.shape)
            return jax.lax.fori_loop(0, n, body, q)
        return run_n
    t = timed(make, (q, k_pages, v_pages, block_ids, seq_lens))
    isz = 1 if dtype == jnp.int8 else 2
    phys = 2 * B * KV_LEN * HKV * D * isz
    print(f"{name} page={page}: {t*1e6:.1f} us  phys {phys/t/1e9:.1f} GB/s  eff {phys*2/isz/t/1e9:.1f} GB/s", flush=True)

run(128, jnp.int8, "int8")
run(256, jnp.int8, "int8")
run(128, jnp.bfloat16, "bf16")
run(256, jnp.bfloat16, "bf16")
