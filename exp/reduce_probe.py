import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmark"))
import numpy as np, jax, jax.numpy as jnp
from common import time_chain, peak_hbm_gbps
from hpc_ops_tpu.ops.moe import reduce as moe_reduce
rng = np.random.default_rng(0)
rows, s, k, h = 36864, 4096, 8, 4096
x = jax.random.normal(jax.random.PRNGKey(0), (rows, h), jnp.bfloat16)
pos = jnp.asarray(rng.integers(0, rows, (s, k)).astype(np.int32))
sc = jnp.asarray(rng.random((s, k)).astype(np.float32))
by = (s*k*h*2 + s*h*2)
for impl in ("auto", "ref"):
    def body(c, impl=impl):
        xc = c
        out = moe_reduce(xc, pos, sc, impl=impl)
        dep = (jnp.max(out).astype(jnp.float32) > 1e30).astype(jnp.bfloat16)
        return xc + dep
    sec = time_chain(body, x, inner=8, trials=4, hint_sec=by/(peak_hbm_gbps()*1e9))
    print(f"[{impl}] {sec*1e6:.0f} us  gather-bytes BW {by/sec/1e9:.0f} GB/s"
          f"{' SUSPECT '+sec.reason if sec.suspect else ''}", flush=True)
