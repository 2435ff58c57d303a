"""Minimal on-TPU isolation for rope_store_rows (rows mode)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from hpc_ops_tpu.ops.rope_kernel import rope_store_rows

rows, hq, hkv, d = 8, 2, 2, 128
h2 = d // 2
rng = np.random.RandomState(0)
qkv = rng.randn(rows, (hq + 2 * hkv) * d).astype(np.float32) * 0.3
cs = rng.randn(rows, d).astype(np.float32)
slots = (np.arange(rows) * 3 + 1).astype(np.int32)
S = 64

q, k2, v2 = rope_store_rows(
    jnp.asarray(qkv, jnp.bfloat16), jnp.asarray(cs),
    None, None, jnp.asarray(slots), jnp.asarray(slots),
    (jnp.zeros((S, hkv, d), jnp.bfloat16), jnp.zeros((S, hkv, d), jnp.bfloat16)),
    hq=hq, hkv=hkv, d=d, dv=d, qk_norm_policy=0, head_major=False,
    interpret=False,
)

# numpy reference
x = jnp.asarray(qkv, jnp.bfloat16).astype(jnp.float32)  # bf16-rounded input
x = np.asarray(x)
def rot(t):
    c, s = cs[:, None, :h2], cs[:, None, h2:]
    t1, t2 = t[..., :h2], t[..., h2:]
    return np.concatenate([t1 * c - t2 * s, t2 * c + t1 * s], -1)
qn = rot(x[:, : hq * d].reshape(rows, hq, d)).reshape(rows, hq * d)
kn = rot(x[:, hq * d : (hq + hkv) * d].reshape(rows, hkv, d))
vn = x[:, (hq + hkv) * d :].reshape(rows, hkv, d)

print("q err:", np.abs(np.asarray(q, np.float32) - qn).max())
k2 = np.asarray(k2, np.float32)
v2 = np.asarray(v2, np.float32)
print("k err:", np.abs(k2[slots] - kn).max())
print("v err:", np.abs(v2[slots] - vn).max())
mask = np.ones(S, bool); mask[slots] = False
print("k untouched rows nonzero:", np.abs(k2[mask]).max())
