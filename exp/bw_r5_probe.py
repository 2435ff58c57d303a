"""Round-5 blockwise grouped-GEMM rework probe.

Hypothesis: the 30 TF blockwise path loses to (a) the [tm, N_pad] f32
accumulator with dynamic lane-slice updates, (b) the f32-roundtrip +
concatenate w-dequant, (c) the one-hot scale-select matmuls, and (d) the
_align_rows XLA scatter pass. Rebuild on the 148 TF scatter-gather
skeleton: in-kernel row gather (int8 codes), one whole-tile x prescale
into bf16 scratch, per-128-slice w dequant (cast + broadcast-mul only),
static-slice dots.

Usage: python exp/bw_r5_probe.py [tm] [tn]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmark"))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from common import time_chain, peak_bf16_tflops  # noqa: E402
from hpc_ops_tpu.utils.common import cdiv, round_up  # noqa: E402
from hpc_ops_tpu.ops.group_gemm import (  # noqa: E402
    group_gemm_blockwise_ref,
    cdiv_dyn,
    _flat_tiles,
)


def _bw_scatter_kernel(
    row_idx_ref, grp_ref, nvt_ref,
    x_hbm_ref,   # [total, Kb, 128] ANY int8
    sx_ref,      # [tm, 128] VMEM f32 (pre-gathered row scales, all kb)
    w_ref,       # [1, tn, tk] VMEM int8
    sw_ref,      # scheme A: [1, 1, tn, 128] f32 (lane kg_local)
                 # scheme B/C: [1, kb8, tn] f32 (sublane kg, lane n)
    o_ref,       # [tm, tn] bf16
    xbuf,        # [2, tm, Kb, 128] int8 scratch
    xs_buf,      # [tm, Kb, 128] bf16 scratch (prescaled rows)
    sem,
    acc_ref,     # [tm, tn] f32
    *, tm: int, kbt: int, single_k: bool, scheme: str = "A",
):
    t = pl.program_id(0)
    jn = pl.program_id(1)
    jk = pl.program_id(2)
    nj = pl.num_programs(1)
    nvt = nvt_ref[0]
    active = t < nvt

    def start_gather(ti, slot):
        copies = []
        for r in range(tm):
            idx = jnp.maximum(row_idx_ref[ti * tm + r], 0)
            c = pltpu.make_async_copy(
                x_hbm_ref.at[idx], xbuf.at[slot, r], sem.at[slot]
            )
            c.start()
            copies.append(c)
        return copies

    @pl.when(active & (t == 0) & (jn == 0) & (jk == 0))
    def _():
        for c in start_gather(0, 0):
            c.wait()

    @pl.when((t + 1 < nvt) & (jn == nj - 1) & (jk == 0))
    def _():
        start_gather(t + 1, (t + 1) % 2)

    @pl.when(active & (t > 0) & (jn == 0) & (jk == 0))
    def _():
        for r in range(tm):
            pltpu.make_async_copy(
                x_hbm_ref.at[0], xbuf.at[t % 2, r], sem.at[t % 2]
            ).wait()

    @pl.when(active)
    def _():
        kb = xbuf.shape[2]
        # whole-tile x prescale, once per tile: int8 -> bf16 * sx column
        # (scheme C keeps int8 codes and promotes both scales instead)
        if scheme != "C":
            @pl.when((jn == 0) & (jk == 0))
            def _():
                sxb = sx_ref[...]  # [tm, 128] f32
                for kg in range(kb):
                    xs_buf[:, kg, :] = (
                        xbuf[t % 2, :, kg, :].astype(jnp.float32)
                        * sxb[:, kg:kg + 1]
                    ).astype(jnp.bfloat16)

        @pl.when(jk == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc = acc_ref[...]
        for kg in range(kbt):
            wslice = w_ref[0][:, kg * 128:(kg + 1) * 128]
            kgg = kg if single_k else jk * kbt + kg
            if scheme == "A":
                swv = sw_ref[0, 0][:, kg:kg + 1]  # [tn, 1] f32 static slice
                wbf = (wslice.astype(jnp.float32) * swv).astype(jnp.bfloat16)
                xsl = xs_buf[:, kgg, :] if single_k else xs_buf[:, jk * kbt + kg, :]
                acc += jax.lax.dot_general(
                    xsl, wbf, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            elif scheme == "B":
                # unscaled bf16 dot; sw applied at promotion (1 fma,
                # [1, tn] lane-vector broadcast)
                wbf = wslice.astype(jnp.bfloat16)
                xsl = xs_buf[:, kgg, :]
                p = jax.lax.dot_general(
                    xsl, wbf, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc += p * sw_ref[0, pl.ds(kgg, 1), :]
            else:
                # full-int8 dot; both scales at promotion:
                # acc += p * sx[:, kg:kg+1] * sw[kg, :]
                p = jax.lax.dot_general(
                    xbuf[t % 2, :, kgg, :], wslice,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc += (
                    p.astype(jnp.float32)
                    * sx_ref[:, pl.ds(kgg, 1)]
                    * sw_ref[0, pl.ds(kgg, 1), :]
                )
        acc_ref[...] = acc

        @pl.when(jk == pl.num_programs(2) - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "interpret", "scheme"))
def bw_scatter_pallas(x, weight, sx, sw, row_idx, grp, tm, tn,
                      num_valid_tiles=None, interpret=False, scheme="A"):
    """x: [total, K] int8; sx: [total, kb] f32; weight: [G, N, K] int8;
    sw: [G, N//128, kb] f32. Output in tile-aligned layout
    [num_tiles*tm, N]."""
    total, k = x.shape
    g, n, _ = weight.shape
    kb = k // 128
    kp_x = round_up(k, 1024)
    np_ = round_up(n, tn)
    # single k-step whenever whole-K weight block fits ~2.5MB double-buffered
    if round_up(k, 512) * tn <= (5 << 20) // 2:
        tk = round_up(k, 512)
        kp_w = tk
    else:
        tk = 1024
        for cand in (4096, 3072, 2048):
            if round_up(k, cand) % cand == 0 and cand * tn <= (5 << 20) // 2:
                tk = cand
                break
        kp_w = round_up(k, tk)
        kp_x = max(kp_x, kp_w)
    kbt = tk // 128
    if kp_x != k:
        x = jnp.pad(x, ((0, 0), (0, kp_x - k)))
    if (np_, kp_w) != (n, k):
        weight = jnp.pad(weight, ((0, 0), (0, np_ - n), (0, kp_w - k)))
    num_tiles = grp.shape[0]
    if num_valid_tiles is None:
        num_valid_tiles = jnp.full((1,), num_tiles, jnp.int32)
    else:
        num_valid_tiles = num_valid_tiles.reshape(1).astype(jnp.int32)

    # pre-gather x scales to tile-aligned rows, pad lanes to 128
    sx_al = jnp.where(
        (row_idx >= 0)[:, None],
        sx[jnp.maximum(row_idx, 0)], 0.0,
    ).astype(jnp.float32)
    sx_al = jnp.pad(sx_al, ((0, 0), (0, 128 - sx_al.shape[1])))

    nk = kp_w // tk
    kbt = tk // 128
    if scheme == "A":
        # w scales: [G, N//128, kb] -> [G, n_ksteps, N_pad, 128] f32:
        # sw4[g, jk, nrow, kgl] = sw[g, nrow//128, jk*kbt + kgl]
        swe = jnp.repeat(sw.astype(jnp.float32), 128, axis=1)  # [G, N, kb]
        swe = jnp.pad(swe, ((0, 0), (0, np_ - n), (0, nk * kbt - kb)))
        sw4 = swe.reshape(g, np_, nk, kbt).transpose(0, 2, 1, 3)
        sw4 = jnp.pad(sw4, ((0, 0), (0, 0), (0, 0), (0, 128 - kbt)))
        sw_spec = pl.BlockSpec(
            (1, 1, tn, 128),
            lambda t, jn, jk, row_r, grp_r, nvt_r: (
                jnp.where(t < nvt_r[0], grp_r[t], 0),
                jnp.where(t < nvt_r[0], jk, 0),
                jnp.where(t < nvt_r[0], jn, 0), 0),
        )
    else:
        # [G, kb_pad8, N_pad] f32 (sublane kg, lane n); block spans all kb
        kb8 = round_up(nk * kbt, 8)
        swe = jnp.repeat(sw.astype(jnp.float32), 128, axis=1)  # [G, N, kb]
        sw4 = jnp.pad(
            swe.transpose(0, 2, 1),
            ((0, 0), (0, kb8 - kb), (0, np_ - n)),
        )
        sw_spec = pl.BlockSpec(
            (1, kb8, tn),
            lambda t, jn, jk, row_r, grp_r, nvt_r: (
                jnp.where(t < nvt_r[0], grp_r[t], 0), 0,
                jnp.where(t < nvt_r[0], jn, 0)),
        )

    def w_map(t, jn, jk, row_r, grp_r, nvt_r):
        act = t < nvt_r[0]
        return (jnp.where(act, grp_r[t], 0), jnp.where(act, jn, 0),
                jnp.where(act, jk, 0))

    out = pl.pallas_call(
        functools.partial(
            _bw_scatter_kernel, tm=tm, kbt=kbt, single_k=(nk == 1),
            scheme=scheme,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_tiles, np_ // tn, nk),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (tm, 128),
                    lambda t, jn, jk, row_r, grp_r, nvt_r: (t, 0),
                ),
                pl.BlockSpec((1, tn, tk), w_map),
                sw_spec,
            ],
            out_specs=pl.BlockSpec(
                (tm, tn), lambda t, jn, jk, row_r, grp_r, nvt_r: (t, jn)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, tm, kp_x // 128, 128), x.dtype),
                pltpu.VMEM((tm, kp_x // 128, 128), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((tm, tn), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles * tm, np_), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(row_idx, grp, num_valid_tiles, x.reshape(total, kp_x // 128, 128),
      sx_al, weight, sw4)
    return out[:, :n]


def build_rowmap(seqlens, cu, tm, total, g):
    tiles_per_g = cdiv_dyn(seqlens, tm)
    cu_tiles = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(tiles_per_g).astype(jnp.int32)]
    )
    total_tiles = cu_tiles[g]
    total_tiles_max = cdiv(total, tm) + g
    grp, _, _, _ = _flat_tiles(seqlens, tm, total_tiles_max)
    slot = jnp.arange(total_tiles_max * tm, dtype=jnp.int32)
    tile = slot // tm
    g_of = grp[tile]
    row_in_group = (tile - cu_tiles[g_of]) * tm + slot % tm
    valid = (tile < total_tiles) & (row_in_group < seqlens[g_of])
    row_idx = jnp.where(valid, cu[g_of] + row_in_group, -1)
    new_row = cu_tiles  # unused
    return row_idx, grp, total_tiles, cu_tiles


def main():
    tm = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    tn = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    # ---- correctness at a small shape
    rng = np.random.RandomState(5)
    g_num, n, k = 4, 512, 1024
    lens = [37, 64, 1, 130]
    total = sum(lens)
    sl = jnp.asarray(lens, jnp.int32)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    kx, kw, ks1, ks2 = jax.random.split(jax.random.PRNGKey(0), 4)
    x8 = jax.random.randint(kx, (total, k), -127, 127, jnp.int8)
    w8 = jax.random.randint(kw, (g_num, n, k), -127, 127, jnp.int8)
    kb = k // 128
    xs = jax.random.uniform(ks1, (total, kb), jnp.float32, 0.5, 2.0) * 1e-2
    ws = jax.random.uniform(ks2, (g_num, n // 128, kb), jnp.float32, 0.5, 2.0)

    tm_c = 64
    row_idx, grp, total_tiles, cu_tiles = build_rowmap(sl, cu, tm_c, total, g_num)
    want = group_gemm_blockwise_ref(x8, w8, sl, cu, xs, ws)
    row = jnp.arange(total, dtype=jnp.int32)
    req = jnp.minimum(jnp.searchsorted(cu[1:], row, side="right").astype(jnp.int32), g_num - 1)
    new_row = cu_tiles[req] * tm_c + (row - cu[req])
    for scheme in ("A", "B", "C"):
        out_al = bw_scatter_pallas(x8, w8, xs, ws, row_idx, grp, tm_c, 256,
                                   num_valid_tiles=total_tiles, scheme=scheme)
        got = out_al[new_row]
        err = jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))
        rel = float(jnp.max(err) / (jnp.max(jnp.abs(want.astype(jnp.float32))) + 1e-9))
        print(f"correctness[{scheme}]: max rel err = {rel:.2e}")
        assert rel < 2e-2, "MISMATCH"

    # ---- perf at the gate-up shape
    g_num, n, k = 8, 4096, 7168
    lens = [132] * 8
    total = sum(lens)
    sl = jnp.asarray(lens, jnp.int32)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    x8 = jax.random.randint(kx, (total, k), -127, 127, jnp.int8)
    w8 = jax.random.randint(kw, (g_num, n, k), -127, 127, jnp.int8)
    kb = k // 128
    xs = jnp.ones((total, kb), jnp.float32)
    ws = jnp.ones((g_num, n // 128, kb), jnp.float32)
    flops = 2 * total * n * k

    row_idx, grp, total_tiles, cu_tiles = build_rowmap(sl, cu, tm, total, g_num)

    for scheme in ("A", "B", "C"):
        def body(carry, scheme=scheme):
            x8c, w8c = carry
            out = bw_scatter_pallas(x8c, w8c, xs, ws, row_idx, grp, tm, tn,
                                    num_valid_tiles=total_tiles, scheme=scheme)
            dep = (jnp.max(out).astype(jnp.float32) > 1e30).astype(jnp.int32)
            return ((x8c.astype(jnp.int32) + dep).astype(jnp.int8), w8c)

        sec = time_chain(body, (x8, w8), inner=8, trials=5,
                         hint_sec=flops / (peak_bf16_tflops() * 1e12))
        print(f"[{scheme}] tm={tm} tn={tn}: {sec*1e6:.0f} us, "
              f"{flops/sec/1e12:.1f} TF"
              f"{' SUSPECT ' + sec.reason if sec.suspect else ''}")


if __name__ == "__main__":
    main()
