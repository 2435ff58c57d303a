"""Promotion-cost isolation for the int8 blockwise scheme (timing only;
variants compute WRONG results by design)."""
import functools, os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmark"))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from common import time_chain, peak_int8_tflops
from hpc_ops_tpu.utils.common import cdiv, round_up
import bw_r5_probe as P

VARIANT = None  # set per run

def _kernel(row_idx_ref, grp_ref, nvt_ref, x_hbm_ref, sx_ref, w_ref, sw_ref,
            o_ref, xbuf, xs_buf, sem, acc_ref, *, tm, kbt, single_k, scheme):
    t = pl.program_id(0); jn = pl.program_id(1); jk = pl.program_id(2)
    nj = pl.num_programs(1); nvt = nvt_ref[0]
    active = t < nvt
    def start_gather(ti, slot):
        cs = []
        for r in range(tm):
            idx = jnp.maximum(row_idx_ref[ti * tm + r], 0)
            c = pltpu.make_async_copy(x_hbm_ref.at[idx], xbuf.at[slot, r], sem.at[slot])
            c.start(); cs.append(c)
        return cs
    @pl.when(active & (t == 0) & (jn == 0) & (jk == 0))
    def _():
        for c in start_gather(0, 0): c.wait()
    @pl.when((t + 1 < nvt) & (jn == nj - 1) & (jk == 0))
    def _():
        start_gather(t + 1, (t + 1) % 2)
    @pl.when(active & (t > 0) & (jn == 0) & (jk == 0))
    def _():
        for r in range(tm):
            pltpu.make_async_copy(x_hbm_ref.at[0], xbuf.at[t % 2, r], sem.at[t % 2]).wait()
    @pl.when(active)
    def _():
        @pl.when(jk == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
        acc = acc_ref[...]
        for kg in range(kbt):
            wslice = w_ref[0][:, kg * 128:(kg + 1) * 128]
            kgg = kg
            p = jax.lax.dot_general(
                xbuf[t % 2, :, kgg, :], wslice, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            if scheme == "C0":      # dots only
                acc += p.astype(jnp.float32)
            elif scheme == "C1":    # sw only (free sublane broadcast)
                acc += p.astype(jnp.float32) * sw_ref[0, pl.ds(kgg, 1), :]
            elif scheme == "C2":    # sx only (lane broadcast)
                acc += p.astype(jnp.float32) * sx_ref[:, pl.ds(kgg, 1)]
            else:                    # full
                acc += (p.astype(jnp.float32) * sx_ref[:, pl.ds(kgg, 1)]
                        * sw_ref[0, pl.ds(kgg, 1), :])
        acc_ref[...] = acc
        @pl.when(jk == pl.num_programs(2) - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

@functools.partial(jax.jit, static_argnames=("tm", "tn", "scheme"))
def run_pallas(x, weight, sx, sw, row_idx, grp, tm, tn, nvt, scheme):
    total, k = x.shape
    g, n, _ = weight.shape
    kb = k // 128
    kp_x = round_up(k, 1024)
    np_ = round_up(n, tn)
    tk = round_up(k, 512); kp_w = tk
    kbt = tk // 128
    if kp_x != k: x = jnp.pad(x, ((0, 0), (0, kp_x - k)))
    if (np_, kp_w) != (n, k):
        weight = jnp.pad(weight, ((0, 0), (0, np_ - n), (0, kp_w - k)))
    num_tiles = grp.shape[0]
    nvt = nvt.reshape(1).astype(jnp.int32)
    sx_al = jnp.where((row_idx >= 0)[:, None], sx[jnp.maximum(row_idx, 0)], 0.0).astype(jnp.float32)
    sx_al = jnp.pad(sx_al, ((0, 0), (0, 128 - sx_al.shape[1])))
    kb8 = round_up(kbt, 8)
    swe = jnp.repeat(sw.astype(jnp.float32), 128, axis=1)
    sw4 = jnp.pad(swe.transpose(0, 2, 1), ((0, 0), (0, kb8 - kb), (0, np_ - n)))
    def w_map(t, jn, jk, row_r, grp_r, nvt_r):
        act = t < nvt_r[0]
        return (jnp.where(act, grp_r[t], 0), jnp.where(act, jn, 0), jnp.where(act, jk, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, tm=tm, kbt=kbt, single_k=True, scheme=scheme),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_tiles, np_ // tn, 1),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((tm, 128), lambda t, jn, jk, r, gr, nv: (t, 0)),
                pl.BlockSpec((1, tn, tk), w_map),
                pl.BlockSpec((1, kb8, tn), lambda t, jn, jk, r, gr, nv: (
                    jnp.where(t < nv[0], gr[t], 0), 0, jnp.where(t < nv[0], jn, 0))),
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda t, jn, jk, r, gr, nv: (t, jn)),
            scratch_shapes=[
                pltpu.VMEM((2, tm, kp_x // 128, 128), x.dtype),
                pltpu.VMEM((8, 8, 128), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((tm, tn), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles * tm, np_), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
    )(row_idx, grp, nvt, x.reshape(total, kp_x // 128, 128), sx_al, weight, sw4)
    return out[:, :n]

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
flops = 2 * total * n * k
row_idx, grp, total_tiles, cu_tiles = P.build_rowmap(sl, cu, tm, total, g_num)
for scheme in ("C0", "C1", "C2", "C"):
    def body(carry, scheme=scheme):
        x8c, w8c = carry
        out = run_pallas(x8c, w8c, xs, ws, row_idx, grp, tm, tn, total_tiles, scheme)
        dep = (jnp.max(out).astype(jnp.float32) > 1e30).astype(jnp.int32)
        return ((x8c.astype(jnp.int32) + dep).astype(jnp.int8), w8c)
    sec = time_chain(body, (x8, w8), inner=8, trials=5,
                     hint_sec=flops / (peak_int8_tflops() * 1e12))
    print(f"[{scheme}] tm={tm} tn={tn}: {sec*1e6:.0f} us, {flops/sec/1e12:.1f} TF"
          f"{' SUSPECT ' + sec.reason if sec.suspect else ''}", flush=True)
