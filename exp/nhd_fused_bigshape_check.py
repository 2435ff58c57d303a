"""Correctness of NHD_FUSED decode at the BENCH shape (b=64, kv=4096,
hkv=8, g=4, bs=64, contiguous tables) — the small-shape probe passed but
the bench row reads 3x HBM peak, so either the kernel skips pages at this
shape or the timing is broken. Checks vs the FUSED layout on identical
quantized pages, plus a direct long-chain wall-clock timing (inner=64,
well above the dispatch floor) to cross-check the differential estimator.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from hpc_ops_tpu.ops.attention.decode import attention_decode
from hpc_ops_tpu.ops.attention.paging import pack_kv_fused_nhd, unpack_kv_fused
from hpc_ops_tpu.ops.quant import quantize_kv_fused_int8

B, KV, HKV, G, D, BS = 64, 4096, 8, 4, 128, 64
hq = HKV * G
nb_per = KV // BS
nb = B * nb_per

kq, kk, kv = jax.random.split(jax.random.PRNGKey(7), 3)
q = jax.random.normal(kq, (B, hq, D), jnp.bfloat16)
k = jax.random.normal(kk, (HKV, nb, BS, D)) / 8
v = jax.random.normal(kv, (HKV, nb, BS, D)) / 8
kv_i8, ks, vs = quantize_kv_fused_int8(
    k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
)
kv_nhd = pack_kv_fused_nhd(*unpack_kv_fused(kv_i8))

tbl = np.arange(nb, dtype=np.int32).reshape(B, nb_per)  # contiguous
block_ids = jnp.asarray(tbl)
seq_lens = jnp.full((B,), KV, jnp.int32)
kw = dict(new_kv_included=True, kscale=ks, vscale=vs)

want = np.asarray(
    attention_decode(q, kv_i8, None, block_ids, seq_lens,
                     cache_layout="FUSED", **kw), np.float32)
got = np.asarray(
    attention_decode(q, kv_nhd, None, block_ids, seq_lens,
                     cache_layout="NHD_FUSED", **kw), np.float32)
err = np.abs(want - got).max()
print(f"bigshape NHD_FUSED vs FUSED: max_err={err:.6f} "
      f"{'OK' if err < 2e-2 else 'FAIL'}", flush=True)

# direct wall-clock: one jit with a 64-long dependent chain. True per-call
# time >= 536MB / 819GB/s = 655us -> chain >= 42ms, far above the ~30ms
# dispatch floor; if wall time comes back ~45-75ms total the kernel really
# is reading everything and the bench row was an estimator artifact.
INNER = 64


def run_n(q, kvp, bi, sl):
    def body(_, q_c):
        out = attention_decode(q_c, kvp, None, bi, sl,
                               cache_layout="NHD_FUSED", **kw)
        return out.astype(q_c.dtype).reshape(q_c.shape)

    return jax.lax.fori_loop(0, INNER, body, q)


f = jax.jit(run_n)
_ = np.asarray(f(q, kv_nhd, block_ids, seq_lens).ravel()[:1])
for _ in range(3):
    t0 = time.perf_counter()
    _ = np.asarray(f(q, kv_nhd, block_ids, seq_lens).ravel()[:1])
    dt = time.perf_counter() - t0
    per = dt / INNER
    phys = 2 * B * KV * HKV * D / per / 1e9
    print(f"chain{INNER}: total={dt*1e3:.1f}ms per_call={per*1e6:.1f}us "
          f"physical={phys:.0f} GB/s", flush=True)
