import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
import sys; sys.path.insert(0, '/root/repo')
from hpc_ops_tpu.ops.attention.decode import unpack_tailrow_kscale

rng = np.random.RandomState(23)
nb, bs, hkv, d = 8, 32, 2, 128
sr = bs * 4 // d
kscale = (rng.rand(nb, bs, hkv).astype(np.float32) + 0.5)

tail = (np.ascontiguousarray(kscale.transpose(0, 2, 1))
        .view(np.uint8).reshape(nb, hkv, sr, d).transpose(0, 2, 1, 3))
k_pages = np.zeros((nb, bs + sr, hkv, d), np.uint8)
k_pages[:, bs:] = tail
k_pages8 = jnp.asarray(k_pages).view(jnp.float8_e4m3fn)

# 1. transfer roundtrip check
back = np.asarray(jax.device_get(k_pages8)).view(np.uint8)
print("transfer byte diff:", int((back != k_pages).sum()), flush=True)

# 2. new unpack check
data, scales = unpack_tailrow_kscale(k_pages8)
scales = np.asarray(scales)[..., 0]
print("scale max abs diff:", np.abs(scales - kscale).max(), flush=True)

# 3. which bytes corrupt?
if (back != k_pages).any():
    idx = np.argwhere(back != k_pages)[:5]
    for i in idx:
        print(tuple(i), "host", hex(k_pages[tuple(i)]), "dev", hex(back[tuple(i)]), flush=True)
