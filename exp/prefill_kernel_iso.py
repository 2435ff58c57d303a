"""Isolate the dense prefill KERNEL from the wrapper: time _prefill_pallas
directly on packed aligned inputs (uniform-length cases; sq must divide L)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmark"))
import numpy as np, jax, jax.numpy as jnp
from common import peak_bf16_tflops, time_chain

from hpc_ops_tpu.ops.attention.prefill import _prefill_pallas

case = sys.argv[1] if len(sys.argv) > 1 else "b8_2k"
tq = int(sys.argv[2]) if len(sys.argv) > 2 else 256
n_tq = int(sys.argv[3]) if len(sys.argv) > 3 else 4
pcb = int(sys.argv[4]) if len(sys.argv) > 4 else 16
lens = {"b8_2k": [2048]*8, "b2_8k": [8192]*2, "b1_32k": [32768],
        "b16_1k": [1024]*16}[case]
BS, D, hkv, g = 64, 128, 8, 4
hq = hkv*g
b = len(lens); L = lens[0]
sq = n_tq*tq
assert L % sq == 0, (L, sq)
total = b*L
nbper = (L + BS - 1)//BS
kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
q_rows = jax.random.normal(kq, (total, hq*D), jnp.bfloat16)
k_pages = (jax.random.normal(kk, (hkv, b*nbper, BS, D))/8).astype(jnp.bfloat16)
v_pages = (jax.random.normal(kv, (hkv, b*nbper, BS, D))/8).astype(jnp.bfloat16)
cu = jnp.arange(b + 1, dtype=jnp.int32)*L
kv_lens = jnp.full((b,), L, jnp.int32)
block_ids = (jnp.arange(b, dtype=jnp.int32)[:, None]*nbper
             + jnp.arange(nbper, dtype=jnp.int32)[None])
ks_dense = jnp.zeros((b, hkv, 1, 128), jnp.float32)
scale = jnp.full((1, 1), D**-0.5*1.4426950408889634, jnp.float32)

def body(carry):
    qc, kc, vc = carry
    out = _prefill_pallas(qc, kc, vc, cu, kv_lens, block_ids,
                          ks_dense, scale, tq, n_tq, pcb, L//sq,
                          packed_out=True)
    dep = (jnp.max(out).astype(jnp.float32) > 1e30).astype(qc.dtype)
    return (qc + dep, kc, vc)

flops = sum(2*2*l*l*hq*D/2 for l in lens)
hint = flops/(peak_bf16_tflops()*1e12)
sec = time_chain(body, (q_rows, k_pages, v_pages), inner=8, trials=4, hint_sec=hint)
tf = flops/sec/1e12
print(f"KERNEL-ONLY {case} tq={tq} n_tq={n_tq} pcb={pcb}: {sec*1e6:.0f}us "
      f"{tf:.1f} TF ({tf/peak_bf16_tflops()*100:.1f}%)", flush=True)
