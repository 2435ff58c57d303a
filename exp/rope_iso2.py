"""Bisect: rope_store_rows with qk-norm policy 1 (ROPE_THEN_NORM) on TPU."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from hpc_ops_tpu.ops.rope_kernel import rope_store_rows

rows, hq, hkv, d = 16, 8, 4, 128
h2 = d // 2
rng = np.random.RandomState(0)
qkv = rng.randn(rows, (hq + 2 * hkv) * d).astype(np.float32) * 0.3
cs = rng.randn(rows, d).astype(np.float32)
qw = (1.0 + 0.1 * rng.randn(d)).astype(np.float32)
kw = (1.0 + 0.1 * rng.randn(d)).astype(np.float32)
slots = (np.arange(rows) * 3 + 1).astype(np.int32)
S = 64

q, k2, v2 = rope_store_rows(
    jnp.asarray(qkv, jnp.bfloat16), jnp.asarray(cs),
    jnp.asarray(qw), jnp.asarray(kw),
    jnp.asarray(slots), jnp.asarray(slots),
    (jnp.zeros((S, hkv, d), jnp.bfloat16), jnp.zeros((S, hkv, d), jnp.bfloat16)),
    hq=hq, hkv=hkv, d=d, dv=d, qk_norm_policy=1, head_major=False,
    interpret=False,
)

x = np.asarray(jnp.asarray(qkv, jnp.bfloat16).astype(jnp.float32))
def rot(t):
    c, s = cs[:, None, :h2], cs[:, None, h2:]
    t1, t2 = t[..., :h2], t[..., h2:]
    return np.concatenate([t1 * c - t2 * s, t2 * c + t1 * s], -1)
def norm(t, w):
    var = (t * t).mean(-1, keepdims=True)
    return t / np.sqrt(var + 1e-6) * w
qn = norm(rot(x[:, : hq * d].reshape(rows, hq, d)), qw).reshape(rows, hq * d)
kn = norm(rot(x[:, hq * d : (hq + hkv) * d].reshape(rows, hkv, d)), kw)
vn = x[:, (hq + hkv) * d :].reshape(rows, hkv, d)

print("q err:", np.abs(np.asarray(q, np.float32) - qn).max())
k2 = np.asarray(k2, np.float32); v2 = np.asarray(v2, np.float32)
print("k err:", np.abs(k2[slots] - kn).max())
print("v err:", np.abs(v2[slots] - vn).max())
