"""Where does rope_norm_store_kv time go? compute vs scatter, at b=256.

Chained differential timing (the only method that works on this host).
"""
import os, sys, time, statistics
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from hpc_ops_tpu.ops.rope import make_cos_sin_cache, rope_norm_store_kv
from hpc_ops_tpu.ops.kv_cache import PagedKVCache, flat_slot_ids, store_kv

D = 128
hq, hkv = 32, 8
b = 256
bs = 64
rows = b
hidden = (hq + 2 * hkv) * D
cos_sin = make_cos_sin_cache(8192, D)
qkv = jax.random.normal(jax.random.PRNGKey(0), (rows, hidden), jnp.bfloat16)
nb = 4 * b
kc = jnp.zeros((nb, bs, hkv, D), jnp.bfloat16)
vc = jnp.zeros((nb, bs, hkv, D), jnp.bfloat16)
seq = jnp.full((b,), 100, jnp.int32)
q_index = jnp.arange(b + 1, dtype=jnp.int32)
tbl = jnp.asarray(np.arange(nb, dtype=np.int32).reshape(b, 4))
k_new = jax.random.normal(jax.random.PRNGKey(1), (rows, hkv, D), jnp.bfloat16)
v_new = jax.random.normal(jax.random.PRNGKey(2), (rows, hkv, D), jnp.bfloat16)
slots = jnp.asarray(np.arange(rows, dtype=np.int32) * bs % (nb * bs))

def timeit(mk, a, inner=10, iters=7):
    runs = {n: mk(n) for n in (inner, 2 * inner)}
    for r in runs.values():
        np.asarray(jax.tree_util.tree_leaves(r(*a))[0].ravel()[:4])
    samples = {n: [] for n in runs}
    for _ in range(iters):
        for n, r in runs.items():
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(r(*a))[0].ravel()[:4])
            samples[n].append(time.perf_counter() - t0)
    return max((statistics.median(samples[2 * inner]) - statistics.median(samples[inner])) / inner, 1e-9)

# 1. full op
def mk_full(n):
    @jax.jit
    def run(kc, vc, qkv, cs, seq, qi, tbl):
        def body(_, carry):
            kc_, vc_ = carry
            _q, kc2, vc2 = rope_norm_store_kv(kc_, vc_, qkv, cs, seq, qi, tbl, False, zero_tails=False)
            return (kc2, vc2)
        return jax.lax.fori_loop(0, n, body, (kc, vc))[0]
    return run

# 2. compute only (store_to_cache=False) — chain via qkv carry dependency
def mk_compute(n):
    @jax.jit
    def run(qkv, cs, seq, qi, tbl):
        def body(_, qkv_):
            q, k, v = rope_norm_store_kv(kc, vc, qkv_, cs, seq, qi, tbl, False, store_to_cache=False)
            return qkv_ + q[:, :1, 0].astype(jnp.bfloat16)  # tiny dep
        return jax.lax.fori_loop(0, n, body, qkv)
    return run

# 3. scatter only (store_kv on precomputed bf16 rows)
def mk_scatter(n):
    @jax.jit
    def run(kc, vc, k_new, v_new, slots):
        def body(_, carry):
            kc_, vc_ = carry
            c = store_kv(PagedKVCache(kc_, vc_), k_new, v_new, slots)
            return (c.k, c.v)
        return jax.lax.fori_loop(0, n, body, (kc, vc))[0]
    return run

t_full = timeit(mk_full, (kc, vc, qkv, cos_sin, seq, q_index, tbl))
print(f"full_op_us={t_full*1e6:.1f}", flush=True)
t_comp = timeit(mk_compute, (qkv, cos_sin, seq, q_index, tbl))
print(f"compute_only_us={t_comp*1e6:.1f}", flush=True)
t_scat = timeit(mk_scatter, (kc, vc, k_new, v_new, slots))
print(f"scatter_only_us={t_scat*1e6:.1f}", flush=True)
bytes_moved = rows * hidden * 2 + rows * hq * D * 2 + rows * 2 * hkv * D * 2
print(f"bytes={bytes_moved} full_gbps={bytes_moved/t_full/1e9:.1f}", flush=True)
