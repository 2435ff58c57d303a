import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
import sys; sys.path.insert(0, '/root/repo')
from hpc_ops_tpu.ops.attention.decode import unpack_tailrow_kscale

rng = np.random.RandomState(23)
nb, bs, hkv, d = 8, 32, 2, 128
sr = bs * 4 // d
kscale = (rng.rand(nb, bs, hkv).astype(np.float32) + 0.5)
kf = rng.randn(nb, bs, hkv, d).astype(np.float32)
kc8 = (kf / kscale[..., None]).astype(np.float32)

tail = (np.ascontiguousarray(kscale.transpose(0, 2, 1))
        .view(np.uint8).reshape(nb, hkv, sr, d).transpose(0, 2, 1, 3))
k_pages = np.zeros((nb, bs + sr, hkv, d), np.uint8)
k_pages[:, :bs] = np.asarray(jnp.asarray(kc8, jnp.float8_e4m3fn)).view(np.uint8)
k_pages[:, bs:] = tail
k_pages8 = jnp.asarray(k_pages).view(jnp.float8_e4m3fn)

data, scales = unpack_tailrow_kscale(k_pages8)
scales = np.asarray(scales)[..., 0]
print("scale max abs diff:", np.abs(scales - kscale).max(), flush=True)
d_ref = np.asarray(jnp.asarray(kc8, jnp.float8_e4m3fn).astype(jnp.float32))
d_got = np.asarray(data.astype(jnp.float32))
print("data max abs diff:", np.abs(d_ref - d_got).max(), flush=True)
