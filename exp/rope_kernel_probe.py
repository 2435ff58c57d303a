import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys; sys.path.insert(0, "/root/repo")
import faulthandler
faulthandler.dump_traceback_later(60, exit=True)
import numpy as np, jax, jax.numpy as jnp
from hpc_ops_tpu.ops.rope_kernel import rope_store_rows

rows, hq, hkv, d, dv = 8, 8, 2, 128, 128
rng = np.random.RandomState(0)
qkv = jnp.asarray(rng.randn(rows, (hq + 2 * hkv) * d), jnp.bfloat16)
cs = jnp.asarray(rng.randn(rows, d), jnp.float32)
slots = jnp.arange(rows, dtype=jnp.int32) * 3
S = 64
kflat = jnp.zeros((S, hkv * d), jnp.bfloat16)
vflat = jnp.zeros((S, hkv * dv), jnp.bfloat16)
print("calling", flush=True)
q, k2, v2 = rope_store_rows(qkv, cs, None, None, slots, slots, (kflat, vflat),
    hq=hq, hkv=hkv, d=d, dv=dv, qk_norm_policy=0, head_major=False, interpret=True)
print("done", q.shape, jnp.abs(k2).sum(), flush=True)
