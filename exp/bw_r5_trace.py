import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmark"))
import numpy as np, jax, jax.numpy as jnp
from common import trace_fn
from bw_r5_probe import bw_scatter_pallas, build_rowmap

tm = int(sys.argv[1]) if len(sys.argv) > 1 else 160
tn = int(sys.argv[2]) if len(sys.argv) > 2 else 256
g_num, n, k = 8, 4096, 7168
lens = [132] * 8
total = sum(lens)
sl = jnp.asarray(lens, jnp.int32)
cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
kx, kw = jax.random.split(jax.random.PRNGKey(0))
x8 = jax.random.randint(kx, (total, k), -127, 127, jnp.int8)
w8 = jax.random.randint(kw, (g_num, n, k), -127, 127, jnp.int8)
xs = jnp.ones((total, k // 128), jnp.float32)
ws = jnp.ones((g_num, n // 128, k // 128), jnp.float32)
row_idx, grp, total_tiles, cu_tiles = build_rowmap(sl, cu, tm, total, g_num)

def fn(x8, w8, xs, ws):
    return bw_scatter_pallas(x8, w8, xs, ws, row_idx, grp, tm, tn,
                             num_valid_tiles=total_tiles)

out = trace_fn(fn, (x8, w8, xs, ws), "/tmp/bw5_trace", iters=2)
import glob, json
from xprof.convert import raw_to_tool_data as r2t
d = sorted(glob.glob("/tmp/bw5_trace/plugins/profile/*"))[-1]
o, _ = r2t.xspace_to_tool_data(glob.glob(d + "/*.xplane.pb"), "framework_op_stats", {})
s = o.decode() if isinstance(o, bytes) else o
for r in json.loads(s)[0]["rows"]:
    c = [x.get("v") for x in r["c"]]
    if c[1] == "Device" and c[2] != "IDLE" and c[5] > 1:
        print(f"{c[5]/2:9.1f}us/call x{int(c[4])} {c[3][:90]}")
