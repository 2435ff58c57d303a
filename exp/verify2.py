import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp, time
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
import hpc_ops_tpu as hpc

t0 = time.time()
# 1. fp8 decode via the new bits path (NHD layout -> stride-native path)
rng = np.random.RandomState(3)
q = jnp.asarray(rng.randn(4, 32, 128), jnp.bfloat16)
kc = jnp.asarray(rng.randn(12, 64, 8, 128) / 8, jnp.float8_e4m3fn)
vc = jnp.asarray(rng.randn(12, 64, 8, 128) / 8, jnp.float8_e4m3fn)
bid = jnp.tile(jnp.arange(2, dtype=jnp.int32)[None], (4, 1))
sl = jnp.full((4,), 100, jnp.int32)
ks = jnp.full((1,), 1.0, jnp.float32); vs = jnp.full((1,), 1.0, jnp.float32)
out = hpc.attention_decode(q, kc, vc, bid, sl, new_kv_included=True,
                           kscale=ks, vscale=vs)
ref = hpc.attention_decode(q, kc, vc, bid, sl, new_kv_included=True,
                           kscale=ks, vscale=vs, impl='ref')
e = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
print('fp8-bits NHD decode err:', e, time.time()-t0, flush=True); assert e < 0.05

# 2. grouped GEMM fp8 via bits path vs oracle
from hpc_ops_tpu.ops.group_gemm import group_gemm_pertensor_fp8, group_gemm_ref
x = jnp.asarray(rng.randn(300, 512) / 8, jnp.float8_e4m3fn)
w = jnp.asarray(rng.randn(4, 256, 512) / 8, jnp.float8_e4m3fn)
seql = jnp.asarray([100, 20, 150, 30], jnp.int32)
cu = jnp.asarray([0, 100, 120, 270, 300], jnp.int32)
ysc = jnp.asarray([1.0, 2.0, 0.5, 1.5], jnp.float32)
got = group_gemm_pertensor_fp8(x, w, seql, cu, ysc)
want = group_gemm_ref(x, w, np.asarray(seql), np.asarray(cu), np.asarray(ysc))
e2 = float(jnp.max(jnp.abs(got.astype(jnp.float32) - jnp.asarray(want).astype(jnp.float32))))
print('gg fp8-bits err:', e2, time.time()-t0, flush=True); assert e2 < 0.25
print('VERIFY2 PASS', flush=True)
