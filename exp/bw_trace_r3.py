"""XProf trace of the blockwise prescale grouped GEMM at the gate-up shape."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmark"))

import numpy as np
import jax
import jax.numpy as jnp

from common import trace_fn  # noqa: E402

from hpc_ops_tpu.ops.group_gemm import group_gemm_blockwise_int8  # noqa: E402

rng = np.random.RandomState(3)
g_num, n, k = 8, 4096, 7168
seqlens = [132] * 8
total = sum(seqlens)
cu = jnp.asarray(np.concatenate([[0], np.cumsum(seqlens)]), jnp.int32)
sl = jnp.asarray(seqlens, jnp.int32)
kx, kw = jax.random.split(jax.random.PRNGKey(0))
x8 = jax.random.randint(kx, (total, k), -127, 127, jnp.int8)
w8 = jax.random.randint(kw, (g_num, n, k), -127, 127, jnp.int8)
xs = jnp.ones((total, k // 128), jnp.float32)
ws = jnp.ones((g_num, n // 128, -(-k // 128)), jnp.float32)


def fn(x8, w8, xs, ws):
    return group_gemm_blockwise_int8(
        x8, w8, sl, cu, xs, ws, x_scale_layout="natural"
    )


out = trace_fn(fn, (x8, w8, xs, ws), "/tmp/bw_trace", iters=2)
print("trace:", out)

import glob, json  # noqa: E402
from xprof.convert import raw_to_tool_data as r2t  # noqa: E402

d = sorted(glob.glob("/tmp/bw_trace/plugins/profile/*"))[-1]
o, _ = r2t.xspace_to_tool_data(glob.glob(d + "/*.xplane.pb"),
                               "framework_op_stats", {})
s = o.decode() if isinstance(o, bytes) else o
for r in json.loads(s)[0]["rows"]:
    c = [x.get("v") for x in r["c"]]
    if c[1] == "Device" and c[2] != "IDLE" and c[5] > 1:
        print(f"{c[5]/2:9.1f}us/call x{int(c[4])} {c[3][:90]}")
