"""Trace sparse prefill with stem vs random mask at equal causal density."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmark"))
import numpy as np, jax, jax.numpy as jnp
from common import trace_fn
from hpc_ops_tpu.ops.attention.prefill import attention_with_kvcache_blocksparse_prefill_fp8
from hpc_ops_tpu.ops.stem import stem_paged_kv

which = sys.argv[1] if len(sys.argv) > 1 else "stem"
BS, D, hkv, g = 64, 128, 8, 4
hq = hkv*g
L = 32768; b = 1
rng = np.random.default_rng(41)
nb = L//BS
kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
q8 = (jax.random.normal(kq, (L, hq, D))/8).astype(jnp.float8_e4m3fn)
kc8 = (jax.random.normal(kk, (nb, BS, hkv, D))/8).astype(jnp.float8_e4m3fn)
vc8 = (jax.random.normal(kv, (nb, BS, hkv, D))/8).astype(jnp.float8_e4m3fn)
cu = jnp.asarray([0, L], jnp.int32)
tbl = jnp.arange(nb, dtype=jnp.int32)[None]
skv = jnp.asarray([L], jnp.int32)
one = jnp.ones((1,), jnp.float32)
if which == "stem":
    qs = jnp.ones((b, hq, L), jnp.float32)
    mask = stem_paged_kv(q8, kc8, vc8, qs, one, one, tbl, cu, skv, skv,
                         initial_blocks=2, window_size=2,
                         k_block_num_rate_medium=0.12, k_block_num_bias_medium=6,
                         k_block_num_rate_large=0.08, k_block_num_bias_large=6)
    mask = jnp.asarray(np.asarray(mask))
else:
    mq = mk = L//128
    tri = (np.arange(mk)[None, :]*128 <= (np.arange(mq)[:, None]+1)*128-1)
    m = (rng.random((b, hq, mq, mk)) < 0.2145) & tri[None, None]
    # keep diagonal
    for i in range(mq): m[:, :, i, i] = True
    mask = jnp.asarray(m.astype(np.uint8))

def fn(q8, kc8, vc8, mask):
    return attention_with_kvcache_blocksparse_prefill_fp8(
        q8, kc8, vc8, None, one, one, cu, tbl, skv, L,
        block_mask=mask, mask_tile_q=128, mask_tile_kv=128)

out = trace_fn(fn, (q8, kc8, vc8, mask), f"/tmp/sp_{which}", iters=2)
import glob, json
from xprof.convert import raw_to_tool_data as r2t
d = sorted(glob.glob(f"/tmp/sp_{which}/plugins/profile/*"))[-1]
o, _ = r2t.xspace_to_tool_data(glob.glob(d+"/*.xplane.pb"), "framework_op_stats", {})
s = o.decode() if isinstance(o, bytes) else o
for r in json.loads(s)[0]["rows"]:
    c = [x.get("v") for x in r["c"]]
    if c[1] == "Device" and c[2] != "IDLE" and c[5] > 5:
        print(f"{c[5]/2:9.1f}us/call x{int(c[4])} {c[3][:80]}")
