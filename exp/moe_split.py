import sys; sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/benchmark')
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
from common import time_chain
from hpc_ops_tpu.ops.moe import _route_aligned, reduce as moe_reduce
from hpc_ops_tpu.ops.group_gemm import _gg_scatter_pallas, _pick_tm
from hpc_ops_tpu.ops.activation import act_mul_and_quant

h, i_local, e_local, e_total, topk, s = 4096, 1536, 16, 128, 8, 1024
rng = np.random.default_rng(0)
x = jax.random.randint(jax.random.PRNGKey(1), (s, h), -127, 127, jnp.int8)
w_gu = jax.random.randint(jax.random.PRNGKey(2), (e_local, 2*i_local, h), -127, 127, jnp.int8)
w_dn = jax.random.randint(jax.random.PRNGKey(3), (e_local, h, i_local), -127, 127, jnp.int8)
topk_ids = jnp.asarray(np.stack([rng.choice(e_total, topk, replace=False) for _ in range(s)]).astype(np.int32))
topk_scale = jnp.asarray(rng.random((s, topk)).astype(np.float32) / topk)
tm = _pick_tm(max(s*topk//e_local, 1))
print('tm =', tm, flush=True)

route = jax.jit(lambda ti: _route_aligned(ti, e_local, 0, tm))
r = route(topk_ids)
row_idx, topk_pos, seqlens, cu, tiles, cu_tiles, grp = r
nvt = cu_tiles[-1]
gu_scale = jnp.full((e_local,), 1e-3, jnp.float32)
dn_scale = jnp.full((e_local,), 1e-3, jnp.float32)
am = jnp.ones((1,), jnp.float32)

def t(name, body, init):
    sec = time_chain(body, init, inner=8, trials=3)
    print(f'{name}: {sec*1e6:.0f} us', flush=True)
    return sec

# route stage
def route_body(c):
    ti = c
    r = _route_aligned(ti, e_local, 0, tm)
    dep = (r[0][0] > 2**30).astype(jnp.int32)
    return ti + dep
t('route', route_body, topk_ids)

# gate-up GG
def gg1_body(c):
    xc = c
    out = _gg_scatter_pallas(xc, w_gu, gu_scale, row_idx, grp, tm, 512,
                             num_valid_tiles=nvt)
    dep = (out[0, 0].astype(jnp.float32) > 1e30).astype(jnp.int32)
    return (xc.astype(jnp.int32) + dep).astype(jnp.int8)
t('gate_up_gg', gg1_body, x)

gu = _gg_scatter_pallas(x, w_gu, gu_scale, row_idx, grp, tm, 512, num_valid_tiles=nvt)

def act_body(c):
    g = c
    out = act_mul_and_quant(g, am, True, out_dtype=jnp.int8)
    dep = (out[0, 0].astype(jnp.int32) > 2**30).astype(jnp.bfloat16)
    return g + dep
t('act_quant', act_body, gu)

di = act_mul_and_quant(gu, am, True, out_dtype=jnp.int8)
ident = jnp.arange(row_idx.shape[0], dtype=jnp.int32)

def gg2_body(c):
    xc = c
    out = _gg_scatter_pallas(xc, w_dn, dn_scale, ident, grp, tm, 512,
                             num_valid_tiles=nvt)
    dep = (out[0, 0].astype(jnp.float32) > 1e30).astype(jnp.int32)
    return (xc.astype(jnp.int32) + dep).astype(jnp.int8)
t('down_gg', gg2_body, di)

dn = _gg_scatter_pallas(di, w_dn, dn_scale, ident, grp, tm, 512, num_valid_tiles=nvt)

def red_body(c):
    d = c
    out = moe_reduce(d, topk_pos, topk_scale)
    dep = (out[0, 0].astype(jnp.float32) > 1e30).astype(jnp.bfloat16)
    return d + dep
t('reduce', red_body, dn)
