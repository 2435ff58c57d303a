"""Grouped GEMM (FP8 per-tensor and blockwise) over varlen token groups.

Reference parity: hpc/group_gemm.py (group_gemm_fp8 / group_gemm_pertensor_fp8
/ group_gemm_blockwise_fp8 / reformat_x_scale). Used standalone and as the two
matmuls of the fused-MoE pipeline.

TPU design: the reference bin-packs per-group tiles onto CTAs via device-built
TMA descriptors + task maps (src/group_gemm/kernels.cuh). On TPU the same idea
becomes a *flat m-tile list*: every group's rows are padded to the m-tile so
group regions tile the row space exactly; a scalar-prefetched array maps each
flat tile -> (group, row-block), and BlockSpec index maps consume it. The grid
is (num_tiles, n_tiles, k_tiles) with zero wasted fetches — tiles past the
dynamic total point at a dedicated trash tile.

FP8 note: fp8 is the storage dtype; tiles are upcast to bf16 at VMEM load
(exact: e4m3 ⊂ bf16) and the MXU runs at full bf16 rate. HBM traffic — the
usual bound for decode-shaped grouped GEMMs — stays at fp8 bytes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpc_ops_tpu.utils.common import (
    cdiv,
    e4m3_bits_to_f32_fast,
    interpret_default,
    round_up,
)


def _e4m3_bf16(x):
    return e4m3_bits_to_f32_fast(x).astype(jnp.bfloat16)


def _as_i8_bits(x):
    """fp8 array -> its bits in int8 (zero-copy reinterpret).

    v5e DMAs fp8-typed arrays ~6-10x below byte rate (no native fp8; VMEM
    expands them to 32-bit words), so fp8 payloads travel as int8 and are
    decoded with integer ops at the compute site (e4m3_bits_to_bf16 —
    bit-exact). Returns (array, fp8_bits flag).
    """
    if x.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        return jax.lax.bitcast_convert_type(x, jnp.int8), True
    return x, False


# --------------------------------------------------------------------- refs


def group_gemm_ref(x, weight, seqlens, cu_seqlens, y_scale=None):
    """fp32 oracle: out[rows of g] = x_g @ weight[g]^T * y_scale[g]."""
    total, k = x.shape
    g, n, _ = weight.shape
    out = jnp.zeros((total, n), jnp.float32)
    xf = x.astype(jnp.float32)
    wf = weight.astype(jnp.float32)
    for gi in range(g):
        s = int(cu_seqlens[gi])
        l = int(seqlens[gi])
        if l == 0:
            continue
        o = xf[s : s + l] @ wf[gi].T
        if y_scale is not None:
            o = o * y_scale[gi]
        out = out.at[s : s + l].set(o)
    return out.astype(jnp.bfloat16)


def group_gemm_blockwise_ref(x, weight, seqlens, cu_seqlens, x_scale_nat, w_scale):
    """Blockwise oracle. x_scale_nat: [total, K//128] (natural layout);
    w_scale: [G, N//128, Kb_pad]."""
    total, k = x.shape
    g, n, _ = weight.shape
    kb = k // 128
    out = jnp.zeros((total, n), jnp.float32)
    xf = x.astype(jnp.float32).reshape(total, kb, 128)
    wf = weight.astype(jnp.float32).reshape(g, n, kb, 128)
    for gi in range(g):
        s = int(cu_seqlens[gi])
        l = int(seqlens[gi])
        if l == 0:
            continue
        # out[m, n] = sum_kb (x_kb @ w_kb^T) * sx[m,kb] * sw[n//128, kb]
        part = jnp.einsum("mkd,nkd->mnk", xf[s : s + l], wf[gi])
        sx = x_scale_nat[s : s + l]  # [l, kb]
        sw = w_scale[gi][:, :kb]  # [n//128, kb]
        swe = jnp.repeat(sw, 128, axis=0)  # [n, kb]
        o = jnp.sum(part * sx[:, None, :] * swe[None, :, :], axis=-1)
        out = out.at[s : s + l].set(o)
    return out.astype(jnp.bfloat16)


# ----------------------------------------------------------------- flat tiles


def _flat_tiles(seqlens, tm: int, total_tiles_max: int):
    """Map flat m-tile -> (group, row_block) for tm-aligned group packing.

    Returns (grp[t], row_blk[t], g_starts[g] aligned row offsets,
    total_tiles dynamic scalar). Tiles >= total_tiles point at the trash
    block (= total_tiles_max, the extra tile appended to x/out).
    """
    g = seqlens.shape[0]
    tiles_per_g = cdiv_dyn(seqlens, tm)
    cu_tiles = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(tiles_per_g).astype(jnp.int32)]
    )
    total_tiles = cu_tiles[g]
    t = jnp.arange(total_tiles_max, dtype=jnp.int32)
    grp = jnp.minimum(
        jnp.searchsorted(cu_tiles[1:], t, side="right").astype(jnp.int32), g - 1
    )
    valid = t < total_tiles
    grp = jnp.where(valid, grp, 0)
    row_blk = jnp.where(valid, t, total_tiles_max)
    g_starts = cu_tiles[:-1] * tm
    return grp, row_blk, g_starts, total_tiles


def cdiv_dyn(x, d: int):
    return (x + d - 1) // d


def _align_rows(x, seqlens, cu_seqlens, g_starts, tm: int, total_pad: int):
    """Repack packed rows so each group starts at a tm-aligned row."""
    total = x.shape[0]
    g = seqlens.shape[0]
    row = jnp.arange(total, dtype=jnp.int32)
    req = jnp.minimum(
        jnp.searchsorted(cu_seqlens[1:], row, side="right").astype(jnp.int32), g - 1
    )
    pos = row - cu_seqlens[req]
    new_row = jnp.where(row < cu_seqlens[g], g_starts[req] + pos, total_pad - 1)
    out = jnp.zeros((total_pad, *x.shape[1:]), x.dtype)
    return out.at[new_row].set(x, mode="drop"), new_row


# ------------------------------------------------------------------- kernels


def _gg_pertensor_kernel(
    grp_ref, row_ref, nvt_ref, x_ref, w_ref, scale_ref, o_ref, acc_ref,
    *, x_bits: bool = False, w_bits: bool = False,
):
    t = pl.program_id(0)  # read outside pl.when (interpret-mode requirement)
    jk = pl.program_id(2)

    @pl.when(t < nvt_ref[0])
    def _():
        @pl.when(jk == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        if x_bits or w_bits:
            # fp8 payload carried as int8 bits (full-rate DMA); exact
            # integer decode to bf16 feeds the MXU
            x = _e4m3_bf16(x_ref[...]) if x_bits else x_ref[...].astype(jnp.bfloat16)
            w = _e4m3_bf16(w_ref[0]) if w_bits else w_ref[0].astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                x, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        elif x_ref.dtype == jnp.int8 and w_ref.dtype == jnp.int8:
            # v5e has a native int8 MXU path (measured 265 TFLOP/s vs 186
            # bf16); fp8 inputs must upconvert (no native fp8 on this
            # generation)
            part = jax.lax.dot_general(
                x_ref[...], w_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            x = x_ref[...].astype(jnp.bfloat16)
            w = w_ref[0].astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                x, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc_ref[...] += part

        @pl.when(jk == pl.num_programs(2) - 1)
        def _():
            sc = scale_ref[grp_ref[t]]
            o_ref[...] = (acc_ref[...] * sc).astype(o_ref.dtype)


def _gg_blockwise_kernel(
    grp_ref, row_ref, nvt_ref, x_ref, w_ref, sx_ref, sw_ref, o_ref, acc_ref,
    *, gk: int, scheme: str, x_bits: bool = False, w_bits: bool = False,
):
    """Blockwise-scale tile, two schemes:

    "fp8": the per-(row, 128-group) x-scale and per-(128x128-block)
    w-scale factor exactly — each product's scale is
    sx[m, g(k)] * sw[g(k), n] — so both operands are pre-scaled
    elementwise on the VPU and ONE wide dot spans ``gk`` scale groups
    (tk = 128*gk). This replaces the round-1 design (tk pinned to 128 +
    one-hot masked scale select per step), whose k=128 matmuls starved
    the MXU. bf16 rounding of the pre-scaled operands adds ~2^-9 rel
    error — far inside e4m3's own ~6% quantization error.

    "int8": per-group s8 x s8 -> s32 dots on the MXU's native int8 path
    (no decode ladder, no operand pre-scale — int8 codes go straight to
    the MXU), each group's s32 partial scaled into the f32 accumulator
    (DeepGEMM's promotion structure, TPU-native). k=128 per dot fills
    the 128x128 systolic array, and ``gk`` dots per grid step amortize
    the step overhead that made the round-1 tk=128 grid slow.

    Scale operand layouts (TPU tiling: the lane dim of every VMEM block
    must be a multiple of 128, so a per-step [tm, gk] block is illegal):
    ``sx_ref`` is ONE [tm, 128] block per m-tile holding all <=128 of the
    row's k-group scales; the 8 scales of step jk are selected with an
    in-kernel one-hot matmul (tm x 128 x 8 — noise next to the MXU step).
    ``sw_ref`` is a [1, 8, tn] block of the TRANSPOSED weight-scale array
    [G, kb_pad8, N] — sublane dim 8 is legal, and each step DMAs exactly
    its 8 x tn scales.
    """
    t = pl.program_id(0)
    jk = pl.program_id(2)

    @pl.when(t < nvt_ref[0])
    def _():
        @pl.when(jk == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        tm, tk = x_ref.shape
        tn = w_ref.shape[1]
        # select this step's gk row-scale columns: s_step[m, gi] =
        # sx[m, jk*gk + gi]  (one-hot MXU matmul; jk is dynamic so a
        # static lane slice is unavailable)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (128, gk), 0)
        cols = jk * gk + jax.lax.broadcasted_iota(jnp.int32, (128, gk), 1)
        sel = (lanes == cols).astype(jnp.float32)
        s_step = jax.lax.dot_general(
            sx_ref[...], sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tm, gk]
        sw8 = sw_ref[0]  # [gk(=8 sublanes), tn]
        if scheme == "int8":
            x8 = x_ref[...]
            w8 = w_ref[0]
            acc = acc_ref[...]
            for gi in range(gk):
                p = jax.lax.dot_general(
                    x8[:, gi * 128 : (gi + 1) * 128],
                    w8[:, gi * 128 : (gi + 1) * 128],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc += (
                    p.astype(jnp.float32)
                    * s_step[:, gi : gi + 1]
                    * sw8[gi].reshape(1, tn)
                )
            acc_ref[...] = acc
        else:
            x = (
                e4m3_bits_to_f32_fast(x_ref[...])
                if x_bits
                else x_ref[...].astype(jnp.float32)
            )
            x = (x.reshape(tm, gk, 128) * s_step[:, :, None]).reshape(tm, tk)
            w = (
                e4m3_bits_to_f32_fast(w_ref[0])
                if w_bits
                else w_ref[0].astype(jnp.float32)
            )
            w = (w.reshape(tn, gk, 128) * sw8.T[:, :, None]).reshape(tn, tk)
            acc_ref[...] += jax.lax.dot_general(
                x.astype(jnp.bfloat16),
                w.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(jk == pl.num_programs(2) - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "tk", "interpret"))
def _gg_pertensor_pallas(
    x_al, weight, y_scale, grp, row_blk, tm, tn, tk, interpret=False,
    num_valid_tiles=None,
):
    x_al, xb = _as_i8_bits(x_al)
    weight, wb = _as_i8_bits(weight)
    total_pad_t, k = x_al.shape  # includes trash tile
    g, n, _ = weight.shape
    np_, kp = round_up(n, tn), round_up(k, tk)
    if (np_, kp) != (n, k):
        weight = jnp.pad(weight, ((0, 0), (0, np_ - n), (0, kp - k)))
    if kp != k:
        x_al = jnp.pad(x_al, ((0, 0), (0, kp - k)))
    num_tiles = grp.shape[0]
    if num_valid_tiles is None:
        num_valid_tiles = jnp.full((1,), num_tiles, jnp.int32)
    else:
        num_valid_tiles = num_valid_tiles.reshape(1).astype(jnp.int32)

    def pin(val, t, nvt_r, alt=0):
        return jnp.where(t < nvt_r[0], val, alt)

    out = pl.pallas_call(
        functools.partial(_gg_pertensor_kernel, x_bits=xb, w_bits=wb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_tiles, np_ // tn, kp // tk),
            in_specs=[
                pl.BlockSpec(
                    (tm, tk),
                    lambda t, jn, jk, grp_r, row_r, nvt_r: (
                        row_r[t], pin(jk, t, nvt_r)
                    ),
                ),
                pl.BlockSpec(
                    (1, tn, tk),
                    lambda t, jn, jk, grp_r, row_r, nvt_r: (
                        pin(grp_r[t], t, nvt_r),
                        pin(jn, t, nvt_r),
                        pin(jk, t, nvt_r),
                    ),
                ),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (tm, tn),
                lambda t, jn, jk, grp_r, row_r, nvt_r: (row_r[t], jn),
            ),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((total_pad_t, np_), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(grp, row_blk, num_valid_tiles, x_al, weight, y_scale.astype(jnp.float32))
    return out[:, :n]


def _gg_bw_prescale_kernel(
    grp_ref, row_ref, nvt_ref, x_ref, w_ref, sx_ref, sw_ref, o_ref,
    acc_ref, xs_buf,
    *, gk: int, x_bits: bool, w_bits: bool, tn: int,
):
    """Blockwise kernel, "prescale" scheme (the fast path).

    Both blockwise scale sets are folded into bf16 operands IN-KERNEL —
    per k-step the ``gk`` per-(row, k-group) x-scales and per-(n-block,
    k-group) w-scales are selected from all-kb [*, 128] blocks (one-hot
    MXU select) and applied as broadcast multiplies on 128-lane slices —
    no reshapes, no per-group accumulator promotion (which ran at VPU
    speed, the round-2 4x blockwise gap), and no wrapper prescale pass (an
    XLA relayout+pad chain over x cost more than the kernel itself). One
    wide [tm, tk=128*gk] bf16 dot per step keeps the MXU fed.

    bf16 pre-scale rounding adds ~2^-9 relative error — inside e4m3's ~6%
    quantization noise and ~1/2 of int8's own 2^-8 step.

    Grid order is (tile, k-step, N-STEP-INNERMOST): the x block stays
    resident across the whole n sweep, so its scaling runs ONCE per
    (tile, k-step) into ``xs_buf`` (at jn==0); with jk innermost the x
    index would reset at every n-block boundary and refetch
    n_steps * K * tm redundant bytes. The accumulator spans all n-blocks
    ([tm, N_pad] f32 scratch).
    """
    t = pl.program_id(0)
    jk = pl.program_id(1)
    jn = pl.program_id(2)

    @pl.when(t < nvt_ref[0])
    def _():
        ncol = pl.ds(jn * tn, tn)
        tm = x_ref.shape[0]

        def sel_cols(all_vals):
            # select this step's gk scale columns from an all-kb block
            lanes = jax.lax.broadcasted_iota(jnp.int32, (128, gk), 0)
            cols = jk * gk + jax.lax.broadcasted_iota(
                jnp.int32, (128, gk), 1
            )
            sel = (lanes == cols).astype(jnp.float32)
            return jax.lax.dot_general(
                all_vals, sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [rows, gk]

        def pieces(src, scale_col, bits):
            # upcast+scale per 128-lane slice: a whole-block f32
            # intermediate is rows*tk*4 bytes of VMEM and blows the budget
            out = []
            for gi in range(gk):
                blk = src[:, gi * 128:(gi + 1) * 128]
                f = (
                    e4m3_bits_to_f32_fast(blk)
                    if bits
                    else blk.astype(jnp.float32)
                )
                out.append(
                    (f * scale_col[:, gi:gi + 1]).astype(jnp.bfloat16)
                )
            return jnp.concatenate(out, axis=1)

        @pl.when(jn == 0)
        def _():
            # scale x once per (tile, k-step); it stays for the n sweep
            xs_buf[...] = pieces(x_ref[...], sel_cols(sx_ref[...]), x_bits)

        @pl.when(jk == 0)
        def _():
            acc_ref[:, ncol] = jnp.zeros((acc_ref.shape[0], tn), jnp.float32)

        sw_step = sel_cols(sw_ref[0])
        w_bf = pieces(w_ref[0], sw_step, w_bits)
        acc_ref[:, ncol] += jax.lax.dot_general(
            xs_buf[...], w_bf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(jk == pl.num_programs(1) - 1)
        def _():
            o_ref[...] = acc_ref[:, ncol].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "interpret"))
def _gg_bw_prescale_pallas(
    x_al, weight, sx_al, sw_nt, grp, row_blk, tm, tn, interpret=False,
    num_valid_tiles=None,
):
    """x_al: [total_pad, K] int8 codes / fp8(bits) aligned rows with
    sx_al [total_pad, 128] f32 all-kb row scales; weight: [G, N, K] int8
    codes or fp8(bits); sw_nt: [G, N, kb<=128] f32 per-(n-row, k-group)
    weight scales (n-expanded). Both scale sets are applied in-kernel."""
    x_al, xb = _as_i8_bits(x_al)
    weight, wb = _as_i8_bits(weight)
    total_pad_t, k = x_al.shape
    g, n, _ = weight.shape
    kb = cdiv(k, 128)
    assert kb <= 128, "blockwise kernel supports K <= 16384"
    # widest k-step fitting the VMEM budget (fine k-grids pay ~1us of
    # Mosaic step overhead per ~0.3us dot): live bytes per 128 k-lanes =
    # double-buffered bf16 x block (4*tm) + double-buffered 8-bit w block
    # (2*tn) + the scaled bf16 w (2*tn)
    gk_max = max((9 << 20) // (128 * (4 * tm + 4 * tn)), 8)
    gk8 = round_up(kb, 8)
    if gk8 <= gk_max:
        gk = gk8  # whole K in one step, zero pad
    else:
        # widest 8-multiple within budget whose padding stays under ~17%
        gk = 8
        for cand in range(gk_max // 8 * 8, 8, -8):
            if round_up(kb, cand) * 6 <= kb * 7:
                gk = cand
                break
    tk = 128 * gk
    kb_p = round_up(kb, gk)
    kp = kb_p * 128
    np_ = round_up(n, tn)
    if kp != k:
        x_al = jnp.pad(x_al, ((0, 0), (0, kp - k)))
    if (np_, kp) != (n, k):
        weight = jnp.pad(weight, ((0, 0), (0, np_ - n), (0, kp - k)))
    # [G, N, kb] -> [G, np_, 128] (lane-dim pad so the block is legal; the
    # block is fetched once per (tile, n-block): its index map ignores jk)
    sw_nt = jnp.pad(
        sw_nt.astype(jnp.float32),
        ((0, 0), (0, np_ - n), (0, 128 - sw_nt.shape[-1])),
    )
    num_tiles = grp.shape[0]
    if num_valid_tiles is None:
        num_valid_tiles = jnp.full((1,), num_tiles, jnp.int32)
    else:
        num_valid_tiles = num_valid_tiles.reshape(1).astype(jnp.int32)

    def pin(val, t, nvt_r, alt=0):
        return jnp.where(t < nvt_r[0], val, alt)

    out = pl.pallas_call(
        functools.partial(
            _gg_bw_prescale_kernel, gk=gk, x_bits=xb, w_bits=wb, tn=tn
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            # jn INNERMOST: keeps the x block resident across the n sweep
            # (see kernel docstring)
            grid=(num_tiles, kp // tk, np_ // tn),
            in_specs=[
                pl.BlockSpec(
                    (tm, tk),
                    lambda t, jk, jn, grp_r, row_r, nvt_r: (
                        row_r[t], pin(jk, t, nvt_r)
                    ),
                ),
                pl.BlockSpec(
                    (1, tn, tk),
                    lambda t, jk, jn, grp_r, row_r, nvt_r: (
                        pin(grp_r[t], t, nvt_r),
                        pin(jn, t, nvt_r),
                        pin(jk, t, nvt_r),
                    ),
                ),
                pl.BlockSpec(
                    (tm, 128),
                    lambda t, jk, jn, grp_r, row_r, nvt_r: (row_r[t], 0),
                ),
                pl.BlockSpec(
                    (1, tn, 128),
                    lambda t, jk, jn, grp_r, row_r, nvt_r: (
                        pin(grp_r[t], t, nvt_r),
                        pin(jn, t, nvt_r),
                        0,
                    ),
                ),
            ],
            out_specs=pl.BlockSpec(
                (tm, tn),
                lambda t, jk, jn, grp_r, row_r, nvt_r: (row_r[t], jn),
            ),
            scratch_shapes=[
                pltpu.VMEM((tm, np_), jnp.float32),
                pltpu.VMEM((tm, tk), jnp.bfloat16),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((total_pad_t, np_), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(grp, row_blk, num_valid_tiles, x_al, weight, sx_al, sw_nt)
    return out[:, :n]


def gg_blockwise_prescale_aligned(
    x_al, weight, sx_al, sw_compact, grp, row_blk, tm, tn,
    interpret=False, num_valid_tiles=None,
):
    """Aligned-rows blockwise entry (used by the fused-MoE pipeline):
    expands the w-scales to per-n rows, pads the x-scales to an all-kb
    [rows, 128] block, and runs the prescale kernel (both scale sets
    applied in-kernel). ``x_al`` may be fp8(-bits) or int8 codes;
    ``sx_al`` [rows, K//128] f32; ``sw_compact`` [G, N//128, >=K//128]
    f32."""
    k = x_al.shape[1]
    kb = k // 128
    sx128 = jnp.pad(
        sx_al[:, :kb].astype(jnp.float32), ((0, 0), (0, 128 - kb))
    )
    n = weight.shape[1]
    sw_nt = jnp.repeat(
        sw_compact[:, :, :kb].astype(jnp.float32), 128, axis=1
    )[:, :n]
    return _gg_bw_prescale_pallas(
        x_al, weight, sx128, sw_nt, grp, row_blk, tm, tn,
        interpret=interpret, num_valid_tiles=num_valid_tiles,
    )


@functools.partial(jax.jit, static_argnames=("tm", "tn", "interpret", "scheme"))
def _gg_blockwise_pallas(
    x_al, weight, sx_al, sw_compact, grp, row_blk, tm, tn, interpret=False,
    num_valid_tiles=None, scheme="fp8",
):
    """sx_al: [total_pad, kb] f32 per-(row, k-group) scales;
    sw_compact: [G, N//128, kb] f32 per-(128x128 block) weight scales.
    scheme "fp8": operands are fp8 (or fp8 bits in int8); "int8":
    operands are int8 codes for the native s8 MXU path.

    TPU tiling note: scale blocks cannot be [*, gk] (lane dim must be a
    multiple of 128), so sx rides as one [tm, 128] padded row block per
    m-tile (kernel selects the step's columns) and sw is transposed to
    [G, kb_pad8, N] so the per-step block is a legal [1, 8, tn]."""
    if scheme == "int8":
        assert x_al.dtype == jnp.int8 and weight.dtype == jnp.int8
        xb = wb = False
    else:
        x_al, xb = _as_i8_bits(x_al)
        weight, wb = _as_i8_bits(weight)
    total_pad_t, k = x_al.shape
    g, n, _ = weight.shape
    kb = cdiv(k, 128)
    assert kb <= 128, "blockwise kernel supports K <= 16384"
    gk = 8  # fixed: 8 scale groups per k-step (tk = 1024)
    tk = 128 * gk
    kb_p = round_up(kb, gk)
    kp = kb_p * 128
    np_ = round_up(n, tn)
    if kp != k:
        x_al = jnp.pad(x_al, ((0, 0), (0, kp - k)))
    if (np_, kp) != (n, k):
        weight = jnp.pad(weight, ((0, 0), (0, np_ - n), (0, kp - k)))
    # sx: [rows, kb] -> [rows, 128] (one full-row scale block per m-tile)
    sx_al = jnp.pad(
        sx_al.astype(jnp.float32)[:, :kb], ((0, 0), (0, 128 - kb))
    )
    # sw: [G, N//128, kb] -> transposed [G, kb_p, N_pad]
    sw_nk = jnp.repeat(sw_compact.astype(jnp.float32)[:, :, :kb], 128, axis=1)
    sw_t = jnp.pad(
        sw_nk.transpose(0, 2, 1), ((0, 0), (0, kb_p - kb), (0, np_ - n))
    )
    num_tiles = grp.shape[0]
    if num_valid_tiles is None:
        num_valid_tiles = jnp.full((1,), num_tiles, jnp.int32)
    else:
        num_valid_tiles = num_valid_tiles.reshape(1).astype(jnp.int32)

    def pin(val, t, nvt_r, alt=0):
        return jnp.where(t < nvt_r[0], val, alt)

    out = pl.pallas_call(
        functools.partial(
            _gg_blockwise_kernel, gk=gk, scheme=scheme, x_bits=xb, w_bits=wb
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_tiles, np_ // tn, kp // tk),
            in_specs=[
                pl.BlockSpec(
                    (tm, tk),
                    lambda t, jn, jk, grp_r, row_r, nvt_r: (
                        row_r[t], pin(jk, t, nvt_r)
                    ),
                ),
                pl.BlockSpec(
                    (1, tn, tk),
                    lambda t, jn, jk, grp_r, row_r, nvt_r: (
                        pin(grp_r[t], t, nvt_r),
                        pin(jn, t, nvt_r),
                        pin(jk, t, nvt_r),
                    ),
                ),
                pl.BlockSpec(
                    (tm, 128),
                    lambda t, jn, jk, grp_r, row_r, nvt_r: (row_r[t], 0),
                ),
                pl.BlockSpec(
                    (1, gk, tn),
                    lambda t, jn, jk, grp_r, row_r, nvt_r: (
                        pin(grp_r[t], t, nvt_r),
                        pin(jk, t, nvt_r),
                        pin(jn, t, nvt_r),
                    ),
                ),
            ],
            out_specs=pl.BlockSpec(
                (tm, tn),
                lambda t, jn, jk, grp_r, row_r, nvt_r: (row_r[t], jn),
            ),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((total_pad_t, np_), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(grp, row_blk, num_valid_tiles, x_al, weight, sx_al, sw_t)
    return out[:, :n]


def _gg_bw_scatter_kernel(
    row_idx_ref,  # [num_tiles*tm] int32 source token row per aligned slot
    grp_ref,  # [num_tiles] int32
    nvt_ref,  # [1] int32
    x_hbm_ref,  # [total, Kb, 128] ANY int8 codes (or fp8 bits)
    sx_ref,  # [tm, 128] VMEM f32 — pre-gathered row scales, kb in lanes
    w_ref,  # [1, tn, kp] VMEM int8 codes (or fp8 bits) — whole K
    sw_ref,  # [1, tn, 128] VMEM f32 — per-(n-row, kb-lane) weight scales
    o_ref,  # [tm, tn] bf16
    xbuf,  # [2, tm, Kbx, 128] scratch (double-buffered row gather)
    xs_buf,  # [tm, kp] bf16 — x codes pre-scaled by sx (whole tile)
    wbuf,  # [tn, kp] bf16 — w codes pre-scaled by sw (per n-block)
    sem,
    *, tm: int, kb: int, kp: int, x_bits: bool, w_bits: bool,
    dq_batches: int = 4,
):
    """Blockwise grouped GEMM, round-5 "scatter" scheme (the fast path).

    Design (probed in exp/bw_r5_probe.py / bw_r5_v4.py against every
    alternative):

    * The 128-group scales are folded into bf16 OPERANDS and the matmul
      runs as few WIDE dots: per-128-group int8 dots with scale promotion
      on the accumulator (DeepGEMM's structure) measured 59-78 TF on v5e
      no matter how the promotion is factored — each scale application
      breaks the MXU's k-accumulation chaining and drags partials through
      the VPU/VMEM, while ONE wide int8 dot over the same operands runs
      148 TF. With bf16 pre-scaled operands the wide dot reaches the bf16
      MXU rate (74 TF at the gate-up shape = exactly the s8/bf16 rate
      ratio) — the structural optimum for exact per-group scaling on a
      generation without native fp8 scale promotion.
    * Dequant is 2 VPU ops per weight element (int8->bf16 cast + a
      broadcast multiply by a STATIC [tn, 1] lane-slice of the scale
      block), staged through ``wbuf`` in ``dq_batches`` chunks so the
      next chunk's dequant overlaps the current chunk's dot (4 batches
      measured 74.3 TF vs 61.7 at 2 — VPU/MXU overlap is real).
    * The row gather (in-kernel DMAs driven by scalar-prefetched indices,
      double-buffered across tiles) replaces the round-2..4 wrapper
      passes: an XLA scatter of x into aligned rows (328us) plus a
      whole-weight pad when the k-step didn't divide K (798us — more
      than the kernel itself, judge-measured r4).
    * bf16 rounding of the pre-scaled operands: int8 codes are EXACT in
      bf16 (8-bit mantissa); only the scale multiply rounds (~2^-9 rel),
      far inside the quantization error of the codes themselves.

    Reference: group_gemm_blockwise_fp8 (src/group_gemm/
    group_gemm_blockwise_fp8.cu, reformat_x_scale entry.cc:227-251),
    DeepGEMM parity 1.1x/1.88x at README.md:179.
    """
    t = pl.program_id(0)
    jn = pl.program_id(1)
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

    @pl.when(active & (t == 0) & (jn == 0))
    def _():
        for c in start_gather(0, 0):
            c.wait()

    @pl.when((t + 1 < nvt) & (jn == nj - 1))
    def _():
        start_gather(t + 1, (t + 1) % 2)

    @pl.when(active & (t > 0) & (jn == 0))
    def _():
        for r in range(tm):
            pltpu.make_async_copy(
                x_hbm_ref.at[0], xbuf.at[t % 2, r], sem.at[t % 2]
            ).wait()

    def dq(codes, bits, scale_col):
        if bits:
            return (
                e4m3_bits_to_f32_fast(codes) * scale_col
            ).astype(jnp.bfloat16)
        return codes.astype(jnp.bfloat16) * scale_col.astype(jnp.bfloat16)

    @pl.when(active)
    def _():
        # whole-tile x prescale, once per tile (amortized over the n sweep)
        @pl.when(jn == 0)
        def _():
            sxb = sx_ref[...]
            for kg in range(kb):
                xs_buf[:, kg * 128:(kg + 1) * 128] = dq(
                    xbuf[t % 2, :, kg, :], x_bits, sxb[:, kg:kg + 1]
                )

        swb = sw_ref[0]  # [tn, 128] f32
        acc = None
        nh = max(-(-kb // dq_batches), 1)
        for h0 in range(0, kb, nh):
            h1 = min(h0 + nh, kb)
            for kg in range(h0, h1):
                wbuf[:, kg * 128:(kg + 1) * 128] = dq(
                    w_ref[0][:, kg * 128:(kg + 1) * 128], w_bits,
                    swb[:, kg:kg + 1],
                )
            part = jax.lax.dot_general(
                xs_buf[:, h0 * 128:h1 * 128], wbuf[:, h0 * 128:h1 * 128],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "interpret"))
def _gg_bw_scatter_pallas(
    x, weight, sx_nat, sw_compact, row_idx, grp, tm, tn,
    num_valid_tiles=None, interpret=False,
):
    """x: [total, K] int8/fp8; sx_nat: [total, ceil(K/128)] f32 natural
    per-token scales; weight: [G, N, K]; sw_compact: [G, N//128,
    >=ceil(K/128)] f32. Output in tile-aligned layout [num_tiles*tm, N_pad]
    (sliced to N)."""
    x, xb = _as_i8_bits(x)
    weight, wb = _as_i8_bits(weight)
    total, k = x.shape
    g, n, _ = weight.shape
    kb = cdiv(k, 128)
    assert kb <= 128, "blockwise scatter kernel supports K <= 16384"
    kp = round_up(k, 512)
    kp_x = round_up(k, 1024)
    np_ = round_up(n, tn)
    if kp_x != k:
        x = jnp.pad(x, ((0, 0), (0, kp_x - k)))
    if (np_, kp) != (n, k):
        weight = jnp.pad(weight, ((0, 0), (0, np_ - n), (0, kp - k)))
    num_tiles = grp.shape[0]
    if num_valid_tiles is None:
        num_valid_tiles = jnp.full((1,), num_tiles, jnp.int32)
    else:
        num_valid_tiles = num_valid_tiles.reshape(1).astype(jnp.int32)

    # pre-gather x scales to tile-aligned rows (tiny: [rows, kb] f32)
    sx_al = jnp.where(
        (row_idx >= 0)[:, None],
        sx_nat[jnp.maximum(row_idx, 0), :kb], 0.0,
    ).astype(jnp.float32)
    sx_al = jnp.pad(sx_al, ((0, 0), (0, 128 - kb)))

    # w scales expanded per n-row with kb in lanes: [G, N_pad, 128] f32 —
    # the kernel's per-kg scale is then a STATIC [tn, 1] lane slice
    swe = jnp.repeat(sw_compact.astype(jnp.float32)[:, :, :kb], 128, axis=1)
    swe = jnp.pad(swe, ((0, 0), (0, np_ - n), (0, 128 - kb)))

    def w_map(t, jn, row_r, grp_r, nvt_r):
        act = t < nvt_r[0]
        return (jnp.where(act, grp_r[t], 0), jnp.where(act, jn, 0), 0)

    out = pl.pallas_call(
        functools.partial(
            _gg_bw_scatter_kernel, tm=tm, kb=kb, kp=kp, x_bits=xb, w_bits=wb,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_tiles, np_ // tn),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (tm, 128), lambda t, jn, row_r, grp_r, nvt_r: (t, 0)
                ),
                pl.BlockSpec((1, tn, kp), w_map),
                pl.BlockSpec(
                    (1, tn, 128),
                    lambda t, jn, row_r, grp_r, nvt_r: (
                        jnp.where(t < nvt_r[0], grp_r[t], 0),
                        jnp.where(t < nvt_r[0], jn, 0), 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (tm, tn), lambda t, jn, row_r, grp_r, nvt_r: (t, jn)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, tm, kp_x // 128, 128), x.dtype),
                pltpu.VMEM((tm, kp), jnp.bfloat16),
                pltpu.VMEM((tn, kp), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles * tm, np_), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(row_idx, grp, num_valid_tiles, x.reshape(total, kp_x // 128, 128),
      sx_al, weight, swe)
    return out


def _bw_scatter_tiles(tm: int, tn: int, k: int, n: int):
    """Clamp (tm, tn) so the scatter-blockwise scratch fits ~14MB VMEM."""
    kp = round_up(k, 512)
    kp_x = round_up(k, 1024)

    def bytes_needed(tm_, tn_):
        return (
            2 * tm_ * kp_x  # xbuf int8 double-buffered
            + 2 * tm_ * kp  # xs_buf bf16
            + 2 * tn_ * kp  # wbuf bf16
            + 2 * 2 * tn_ * kp  # w block double-buffered (int8 per elem,
            # but Mosaic may stage fp8-bits wider — budget 2B)
        )

    while tn > 128 and bytes_needed(tm, tn) > (14 << 20):
        tn //= 2
    while tm > 32 and bytes_needed(tm, tn) > (14 << 20):
        tm = max(round_up(tm // 2, 32), 32)
    return tm, tn


def _gg_scatter_kernel(
    row_idx_ref,  # [num_tiles*tm] int32 source token row per aligned slot
    grp_ref,  # [num_tiles] int32
    nvt_ref,  # [1] int32 — dynamic count of tiles with real rows
    x_hbm_ref,  # [total_tokens, Kb, 128] ANY (3D view: row slices are full
    #            in both trailing dims, satisfying DMA tiling rules)
    w_ref,  # [1, tn, tk] VMEM block
    scale_ref,  # [G] SMEM
    am_ref,  # [1] SMEM activation quant scale (act_fuse only)
    o_ref,  # [tm, tn] VMEM block ([tm, tn//2] when act_fuse)
    xbuf,  # [2, tm, Kb, 128] VMEM scratch (double-buffered row gather)
    sem,
    acc_ref,
    *,
    tm: int,
    kbt: int,  # K-tile in lane-groups of 128 (tk = kbt * 128)
    x_bits: bool = False,
    w_bits: bool = False,
    act_fuse: bool = False,
    use_bf16_mul: bool = True,
    single_k: bool = False,  # grid has one k-step (kp == tk)
):
    """Scatter grouped GEMM (reference op #9,
    src/group_gemm/cp_async/entry.cc group_gemm_fp8_scatter): token rows are
    gathered from HBM *inside* the kernel via per-row DMAs driven by
    scalar-prefetched row indices, so no gathered copy of x is ever
    materialized (the reference fuses the MoE gather into the GEMM the same
    way). The gather runs once per m-tile (first (jn, jk) step) and the rows
    stay in VMEM scratch for every weight block. Slots with index < 0 read
    row 0; their outputs are garbage by contract and dropped by the consumer
    (reference behavior for off-rank tokens). Weights stream in (tn, tk)
    blocks — 8-bit types occupy 32 bits/element in VMEM on generations
    without native fp8, so a full-K weight block would blow the VMEM budget.

    ``act_fuse``: the MoE gate-up epilogue. The weight was pre-interleaved
    (``interleave_gate_up``) so each n-block holds tn//2 gate rows then the
    matching tn//2 up rows; the epilogue computes
    ``round(silu(gate)*up*am_ref[0])`` -> int8 and writes a [tm, tn//2]
    block. This collapses the reference's separate act_mul_and_quant launch
    (src/fuse_moe/fuse_moe.cu k3) into the GEMM and never materializes the
    bf16 gate_up intermediate in HBM.
    """
    t = pl.program_id(0)
    jn = pl.program_id(1)
    jk = pl.program_id(2)
    nj = pl.num_programs(1)
    nvt = nvt_ref[0]
    # tiles past the dynamic valid count hold no real rows (EP drops
    # off-rank tokens): skip their gathers and matmuls entirely — with
    # small expert-parallel shares they are the majority of the grid
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

    # the row gather is DOUBLE-BUFFERED across m-tiles: tile t+1's rows
    # stream in while tile t computes (a serial gather at tile start was
    # ~2x dead time on decode-shaped runs); tile 0 gathers synchronously
    @pl.when(active & (t == 0) & (jn == 0) & (jk == 0))
    def _():
        for c in start_gather(0, 0):
            c.wait()

    @pl.when((t + 1 < nvt) & (jn == nj - 1) & (jk == 0))
    def _():
        start_gather(t + 1, (t + 1) % 2)

    @pl.when(active & (t > 0) & (jn == 0) & (jk == 0))
    def _():
        # wait for the prefetch issued by tile t-1
        for r in range(tm):
            pltpu.make_async_copy(
                x_hbm_ref.at[0], xbuf.at[t % 2, r], sem.at[t % 2]
            ).wait()

    @pl.when(active)
    def _():
        @pl.when(jk == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        _, tm_, kb, _ = xbuf.shape
        if single_k:
            # one k-step: jk == 0 always, but Mosaic can only prove the
            # sublane offset aligned if it is the literal 0 (kbt need not
            # be a multiple of 8 here, e.g. K=1536 -> kbt=12)
            xk = xbuf[t % 2, :, pl.ds(0, kbt), :].reshape(tm_, kbt * 128)
        else:
            # multi-step k-tiles keep tk % 1024 == 0, so kbt % 8 == 0 and
            # the dynamic sublane offset is provably tile-aligned
            off = pl.multiple_of(jk * kbt, kbt)
            xk = xbuf[t % 2, :, pl.ds(off, kbt), :].reshape(tm_, kbt * 128)
        if x_bits or w_bits:
            acc_ref[...] += jax.lax.dot_general(
                _e4m3_bf16(xk) if x_bits else xk.astype(jnp.bfloat16),
                _e4m3_bf16(w_ref[0]) if w_bits else w_ref[0].astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        elif xbuf.dtype == jnp.int8 and w_ref.dtype == jnp.int8:
            # native int8 MXU path (no upconvert)
            acc_ref[...] += jax.lax.dot_general(
                xk, w_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            x = xk.astype(jnp.bfloat16)
            w = w_ref[0].astype(jnp.bfloat16)
            acc_ref[...] += jax.lax.dot_general(
                x, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(jk == pl.num_programs(2) - 1)
        def _():
            sc = scale_ref[grp_ref[t]]
            if act_fuse:
                # match act_mul_and_quant's numerics exactly: the unfused
                # pipeline writes the GEMM output as bf16, so round the
                # dequantized halves through bf16 before the activation
                accs = (acc_ref[...] * sc).astype(jnp.bfloat16)
                h2 = accs.shape[1] // 2
                gate = accs[:, :h2].astype(jnp.float32)
                act = gate * jax.nn.sigmoid(gate)
                if use_bf16_mul:
                    prod = (
                        act.astype(jnp.bfloat16) * accs[:, h2:]
                    ).astype(jnp.float32)
                else:
                    prod = act * accs[:, h2:].astype(jnp.float32)
                y = prod * am_ref[0]
                if o_ref.dtype == jnp.int8:
                    o_ref[...] = jnp.clip(
                        jnp.round(y), -127, 127
                    ).astype(jnp.int8)
                else:
                    o_ref[...] = y.astype(o_ref.dtype)
            else:
                o_ref[...] = (acc_ref[...] * sc).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "tm", "tn", "tk", "interpret", "act_fuse", "use_bf16_mul", "out_dtype"
    ),
)
def _gg_scatter_pallas(
    x, weight, y_scale, row_idx, grp, tm, tn, tk=1024, interpret=False,
    num_valid_tiles=None, act_fuse=False, act_scale=None, use_bf16_mul=True,
    out_dtype=jnp.bfloat16,
):
    x, xb = _as_i8_bits(x)
    weight, wb = _as_i8_bits(weight)
    total, k = x.shape
    g, n, _ = weight.shape
    # Row slabs are DMA'd as whole [Kb, 128] views, and Mosaic requires the
    # sublane extent of any sliced view to be a multiple of 8 -> the
    # gathered-x buffer pads K to a 1024 multiple (kp_x). The WEIGHT and the
    # dot keep the tighter 512-multiple K (kp_w): for e.g. K=1536 the kernel
    # gathers (16,128) slabs but statically lane-slices the register to
    # 1536 before the dot — no extra MACs, no weight padding; only the row
    # gather moves the pad bytes.
    kp_w = round_up(k, 512)
    # Single k-step whenever the whole-K weight block fits the VMEM budget
    # (~2.5MB double-buffered): at tk=1024 the grid-step overhead (~1us of
    # Mosaic bookkeeping per step) dominated the 0.34us int8 dot — measured
    # 44 TF at the 8-group gate-up shape vs ~180 TF with full-K steps.
    w_item = 1 if (wb or weight.dtype == jnp.int8) else 2
    if kp_w * tn * w_item <= (5 << 20) // 2:
        tk = kp_w
        kp_x = round_up(k, 1024)
    else:
        # widest 1024-multiple k-tile dividing kp_w within the budget
        kp_w = round_up(k, 1024)
        tk = 1024
        for cand in (4096, 3072, 2048):
            if kp_w % cand == 0 and cand * tn * w_item <= (5 << 20) // 2:
                tk = cand
                break
        kp_w = kp_x = round_up(k, tk)
    assert kp_w == tk or tk % 1024 == 0, (
        "multi-step k-tiles must keep the sublane offset 8-aligned"
    )
    np_ = round_up(n, tn)
    if act_fuse:
        assert n % tn == 0 and tn % 256 == 0, (
            "act_fuse needs gate/up pairs to tile n-blocks exactly"
        )
        assert act_scale is not None
    else:
        act_scale = jnp.zeros((1,), jnp.float32)
    if kp_x != k:
        x = jnp.pad(x, ((0, 0), (0, kp_x - k)))
    if kp_w != k:
        weight = jnp.pad(weight, ((0, 0), (0, 0), (0, kp_w - k)))
    if np_ != n:
        weight = jnp.pad(weight, ((0, 0), (0, np_ - n), (0, 0)))
    num_tiles = grp.shape[0]
    kb = kp_x // 128
    kbt = tk // 128
    if num_valid_tiles is None:
        num_valid_tiles = jnp.full((1,), num_tiles, jnp.int32)
    else:
        num_valid_tiles = num_valid_tiles.reshape(1).astype(jnp.int32)

    def w_map(t, jn, jk, row_r, grp_r, nvt_r):
        # inactive tiles pin the weight block to (0,0,0) so consecutive
        # skipped steps never re-fetch
        act = t < nvt_r[0]
        return (
            jnp.where(act, grp_r[t], 0),
            jnp.where(act, jn, 0),
            jnp.where(act, jk, 0),
        )

    if act_fuse:
        # [tm, tn//2] int8 blocks; one extra trash m-tile so the result can
        # feed the aligned (row_blk-indexed) grouped GEMM directly
        to = tn // 2
        out_rows = (num_tiles + 1) * tm
        out_cols = np_ // 2
        out_dt = out_dtype if out_dtype != jnp.bfloat16 else jnp.int8
    else:
        to = tn
        out_rows = num_tiles * tm
        out_cols = np_
        out_dt = jnp.bfloat16
    out = pl.pallas_call(
        functools.partial(
            _gg_scatter_kernel, tm=tm, kbt=kbt, x_bits=xb, w_bits=wb,
            act_fuse=act_fuse, use_bf16_mul=use_bf16_mul,
            single_k=(kp_w == tk),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_tiles, np_ // tn, kp_w // tk),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, tn, tk), w_map),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (tm, to), lambda t, jn, jk, row_r, grp_r, nvt_r: (t, jn)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, tm, kb, 128), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((tm, tn), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((out_rows, out_cols), out_dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        row_idx, grp, num_valid_tiles, x.reshape(total, kb, 128), weight,
        y_scale.astype(jnp.float32), act_scale.reshape(1).astype(jnp.float32),
    )
    return out if act_fuse else out[:, :n]


def group_gemm_fp8_scatter(
    x,
    weight,
    y_scale,
    row_indices,
    grp,
    num_seq_per_group_avg: int = 32,
    *,
    tn: int = 256,
    impl: str = "auto",
):
    """Low-latency scatter grouped GEMM (reference ops #9/#12,
    group_gemm_fp8_scatter_cp_async): ``out[slot] = x[row_indices[slot]] @
    W[grp[slot // tm]]^T * y_scale[grp]``.

    x: [total_tokens, K] fp8/bf16 (original, un-gathered tokens);
    row_indices: [num_tiles * tm] int32 source row per aligned output slot
    (-1 = empty slot, output garbage — dropped by the consumer);
    grp: [num_tiles] int32 expert/group of each m-tile.
    Returns [num_tiles * tm, N] bf16 in the tile-aligned layout.

    The reference constrains this path to N_tp <= 512 (hpc/fuse_moe.py:133)
    because the token gather re-runs per n-tile; same economics here.
    """
    tm = _pick_tm(num_seq_per_group_avg, x.shape[1])
    if impl == "ref":
        xg = jnp.where(
            (row_indices >= 0)[:, None], x[jnp.maximum(row_indices, 0)], 0
        )
        o = jnp.einsum(
            "sk,snk->sn",
            xg.astype(jnp.float32),
            weight.astype(jnp.float32)[jnp.repeat(grp, tm)],
        )
        return (o * y_scale[jnp.repeat(grp, tm)][:, None]).astype(jnp.bfloat16)
    return _gg_scatter_pallas(
        x, weight, y_scale, row_indices.astype(jnp.int32),
        grp.astype(jnp.int32), tm, min(tn, round_up(weight.shape[1], 128)),
        interpret=interpret_default(),
    )


def _pick_tm(num_seq_per_group_avg: int, k: int | None = None) -> int:
    """m-tile for ~navg rows per group: the next 32-multiple above
    navg*9/8 (32 = the int8 VMEM sublane tile; the 12.5% headroom absorbs
    routing variance so typical groups stay in ONE tile — a second tile
    re-streams the group's whole weight). Power-of-two-only rungs computed
    up to 1.94x padding FLOPs at MoE-decode populations (e.g. 132 rows ->
    256-row tiles). The scatter kernel's double-buffered row gather costs
    2*tm*K bytes of VMEM, which caps the tile for wide K."""
    tm = min(max(round_up(num_seq_per_group_avg * 9 // 8, 32), 32), 512)
    if k is not None:
        while tm > 256 and 2 * tm * round_up(k, 1024) > 8 * 1024 * 1024:
            tm = max(round_up(tm // 2, 32), 256)
    return tm


# --------------------------------------------------------------- public API


def group_gemm_pertensor_fp8(
    x,
    weight,
    seqlens,
    cu_seqlens,
    y_scale,
    num_seq_per_group_avg: int | None = None,
    *,
    tn: int = 256,
    tk: int = 512,
    impl: str = "auto",
):
    """Per-group-scale FP8 grouped GEMM: rows of group g -> x_g @ W_g^T * y_scale[g].

    x: [total_seq, K] fp8/bf16 packed by group; weight: [G, N, K];
    seqlens/cu_seqlens: [G]/[G+1] int32; y_scale: [G] f32.
    Returns [total_seq, N] bf16.
    """
    if impl == "ref":
        return group_gemm_ref(x, weight, seqlens, cu_seqlens, y_scale)
    total, k = x.shape
    g = seqlens.shape[0]
    if num_seq_per_group_avg is None:
        # reference derives the m-tile from the average group population
        # (src/group_gemm/cp_async/entry.cc: total_tokens / num_group);
        # undersized tiles multiply the weight-block traffic
        num_seq_per_group_avg = max(total // max(g, 1), 1)
    tm = _pick_tm(num_seq_per_group_avg, k)
    total_tiles_max = cdiv(total, tm) + g
    seqlens = seqlens.astype(jnp.int32)
    cu = cu_seqlens.astype(jnp.int32)

    # Build the slot -> source-row map with vector math only (no scatter of
    # x into an aligned copy — the kernel gathers rows from x in-place).
    tiles_per_g = cdiv_dyn(seqlens, tm)
    cu_tiles = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(tiles_per_g).astype(jnp.int32)]
    )
    total_tiles = cu_tiles[g]
    grp, _, _, _ = _flat_tiles(seqlens, tm, total_tiles_max)
    slot = jnp.arange(total_tiles_max * tm, dtype=jnp.int32)
    tile = slot // tm
    g_of = grp[tile]
    row_in_group = (tile - cu_tiles[g_of]) * tm + slot % tm
    valid = (tile < total_tiles) & (row_in_group < seqlens[g_of])
    row_idx = jnp.where(valid, cu[g_of] + row_in_group, -1)

    out_al = _gg_scatter_pallas(
        x, weight, y_scale, row_idx, grp, tm, tn,
        interpret=interpret_default(), num_valid_tiles=total_tiles,
    )
    # compact back: packed row -> its aligned slot
    row = jnp.arange(total, dtype=jnp.int32)
    req = jnp.minimum(
        jnp.searchsorted(cu[1:], row, side="right").astype(jnp.int32), g - 1
    )
    new_row = cu_tiles[req] * tm + (row - cu[req])
    return out_al[new_row]


def group_gemm_fp8(x, weight, seqlens, cu_seqlens, y_scale, num_seq_per_group_avg=32, **kw):
    """Alias of :func:`group_gemm_pertensor_fp8` (reference keeps both names)."""
    return group_gemm_pertensor_fp8(
        x, weight, seqlens, cu_seqlens, y_scale, num_seq_per_group_avg, **kw
    )


def group_gemm_pertensor_int8(
    x, weight, seqlens, cu_seqlens, y_scale, num_seq_per_group_avg=None, **kw
):
    """Per-group-scale INT8 grouped GEMM (TPU-native extension).

    Same contract as :func:`group_gemm_pertensor_fp8` but with int8 x and
    weight: the kernel runs the MXU's native s8 x s8 -> s32 path (measured
    ~1.4x bf16 and ~1.7x the fp8-upconvert path on v5e, which has no
    native fp8). ``y_scale[g]`` should fold both operand scales
    (x_scale * w_scale[g]). Quantize with
    :func:`hpc_ops_tpu.ops.quant.scaled_int8_quant`.
    """
    assert x.dtype == jnp.int8 and weight.dtype == jnp.int8
    return group_gemm_pertensor_fp8(
        x, weight, seqlens, cu_seqlens, y_scale, num_seq_per_group_avg, **kw
    )


def _group_gemm_blockwise(
    x,
    weight,
    seqlens,
    cu_seqlens,
    x_scale,
    w_scale,
    num_seq_per_group_avg: int | None = None,
    *,
    x_scale_layout: str = "transposed",
    tn: int = 256,
    impl: str = "auto",
    scheme: str = "scatter",
):
    total, k = x.shape
    g, n, _ = weight.shape
    kb = k // 128
    if num_seq_per_group_avg is None:
        num_seq_per_group_avg = max(total // max(g, 1), 1)

    if scheme == "scatter" and impl != "ref":
        # round-5 default: in-kernel row gather + wide bf16 dots with both
        # scale sets folded into operands (see _gg_bw_scatter_kernel) —
        # no wrapper scatter/pad passes at all
        tm0 = _pick_tm(num_seq_per_group_avg)  # reformat layout convention
        if x_scale_layout == "transposed":
            tiles0 = cdiv_dyn(seqlens.astype(jnp.int32), tm0)
            cu_tiles0 = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32),
                 jnp.cumsum(tiles0).astype(jnp.int32)]
            )
            cu_i = cu_seqlens.astype(jnp.int32)
            row = jnp.arange(total, dtype=jnp.int32)
            req = jnp.minimum(
                jnp.searchsorted(cu_i[1:], row, side="right").astype(
                    jnp.int32
                ),
                g - 1,
            )
            al = cu_tiles0[req] * tm0 + (row - cu_i[req])
            sxt = x_scale.T
            sx_nat = sxt[jnp.minimum(al, sxt.shape[0] - 1)]
        else:
            sx_nat = x_scale[:total]
        tm, tn = _bw_scatter_tiles(tm0, tn, k, n)
        seqlens_i = seqlens.astype(jnp.int32)
        cu_i = cu_seqlens.astype(jnp.int32)
        tiles_per_g = cdiv_dyn(seqlens_i, tm)
        cu_tiles = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(tiles_per_g).astype(jnp.int32)]
        )
        total_tiles = cu_tiles[g]
        total_tiles_max = cdiv(total, tm) + g
        grp, _, _, _ = _flat_tiles(seqlens_i, tm, total_tiles_max)
        slot = jnp.arange(total_tiles_max * tm, dtype=jnp.int32)
        tile = slot // tm
        g_of = grp[tile]
        row_in_group = (tile - cu_tiles[g_of]) * tm + slot % tm
        valid = (tile < total_tiles) & (row_in_group < seqlens_i[g_of])
        row_idx = jnp.where(valid, cu_i[g_of] + row_in_group, -1)
        out_al = _gg_bw_scatter_pallas(
            x, weight, sx_nat, w_scale, row_idx, grp, tm, tn,
            num_valid_tiles=total_tiles, interpret=interpret_default(),
        )
        row = jnp.arange(total, dtype=jnp.int32)
        req = jnp.minimum(
            jnp.searchsorted(cu_i[1:], row, side="right").astype(jnp.int32),
            g - 1,
        )
        new_row = cu_tiles[req] * tm + (row - cu_i[req])
        return out_al[new_row, :n]

    tm = _pick_tm(num_seq_per_group_avg)
    # the prescale kernel's accumulator spans all n-blocks ([tm, N_pad]
    # f32) so the x block stays resident across the n sweep — cap tm to
    # keep it inside the VMEM budget
    while tm > 64 and tm * round_up(n, tn) * 4 > (6 << 20):
        tm = max(round_up(tm // 2, 32), 64)
    total_tiles_max = cdiv(total, tm) + g
    total_pad = (total_tiles_max + 1) * tm
    grp, row_blk, g_starts, total_tiles = _flat_tiles(
        seqlens.astype(jnp.int32), tm, total_tiles_max
    )
    x_al, new_row = _align_rows(
        x, seqlens.astype(jnp.int32), cu_seqlens.astype(jnp.int32), g_starts, tm, total_pad
    )
    if x_scale_layout == "transposed":
        # reformat_x_scale output is already the tm-aligned row layout.
        sx_t = x_scale.T.astype(jnp.float32)  # [compact_total_pad, kb]
        pad = total_pad - sx_t.shape[0]
        sx_al = jnp.pad(sx_t, ((0, max(pad, 0)), (0, 0)))[:total_pad]
        x_scale_nat = sx_al[new_row]
    else:
        x_scale_nat = x_scale[:total].astype(jnp.float32)
        sx_al, _ = _align_rows(
            x_scale_nat,
            seqlens.astype(jnp.int32),
            cu_seqlens.astype(jnp.int32),
            g_starts,
            tm,
            total_pad,
        )
    if impl == "ref":
        return group_gemm_blockwise_ref(
            x, weight, seqlens, cu_seqlens, x_scale_nat, w_scale
        )
    if scheme == "prescale":
        # fold the x-scales into bf16 pre-scaled rows (one elementwise pass;
        # x traffic is a few % of the weight stream at MoE shapes), then run
        # the W-side-scaling kernel — see _gg_bw_prescale_kernel
        out_al = gg_blockwise_prescale_aligned(
            x_al, weight, sx_al, w_scale, grp, row_blk, tm, tn,
            interpret=interpret_default(), num_valid_tiles=total_tiles,
        )
        return out_al[new_row]
    out_al = _gg_blockwise_pallas(
        x_al, weight, sx_al, w_scale[:, :, :kb], grp, row_blk, tm, tn,
        interpret=interpret_default(), num_valid_tiles=total_tiles,
        scheme=scheme,
    )
    return out_al[new_row]


def group_gemm_blockwise_fp8(
    x,
    weight,
    seqlens,
    cu_seqlens,
    x_scale,
    w_scale,
    num_seq_per_group_avg: int | None = None,
    **kw,
):
    """Blockwise (128-group) FP8 grouped GEMM.

    x: [total_seq, K] fp8; weight: [G, N, K] fp8;
    x_scale: reference layout [K//128, total_seq_pad] f32
    (``x_scale_layout="transposed"``, see reformat_x_scale) or natural
    [total_seq, K//128] (``"natural"``);
    w_scale: [G, N//128, ceil(K/128) padded to 4] f32.
    Returns [total_seq, N] bf16.

    ``scheme``: "scatter" (default — in-kernel row gather + wide bf16
    dots with both scale sets folded into operands, see
    _gg_bw_scatter_kernel), "prescale" (aligned-rows bf16 pre-scale,
    see _gg_bw_prescale_kernel) or "fp8" (in-kernel factored operand
    scaling).
    """
    kw.setdefault("scheme", "scatter")
    return _group_gemm_blockwise(
        x, weight, seqlens, cu_seqlens, x_scale, w_scale,
        num_seq_per_group_avg, **kw,
    )


def group_gemm_blockwise_int8(
    x,
    weight,
    seqlens,
    cu_seqlens,
    x_scale,
    w_scale,
    num_seq_per_group_avg: int | None = None,
    **kw,
):
    """Blockwise (128-group) INT8 grouped GEMM (TPU-native extension).

    Same contract and scale layouts as :func:`group_gemm_blockwise_fp8`
    but with int8 codes (quantize with
    :func:`hpc_ops_tpu.ops.quant.blockwise_int8_quant`): per-group
    Same contract and scale layouts as :func:`group_gemm_blockwise_fp8`
    but with int8 codes (quantize with
    :func:`hpc_ops_tpu.ops.quant.blockwise_int8_quant`).

    ``scheme``: "scatter" (default) folds both blockwise scales into bf16
    operands in-kernel and runs wide bf16 dots over gathered rows — the
    structural optimum for exact per-group scaling on v5e: the "int8"
    scheme's per-128-group f32 promotion (DeepGEMM's structure:
    s8xs8->s32 dots + scale-accumulate) breaks the MXU's k-accumulation
    chaining, measured 59-78 TF however the promotion is factored vs 148
    for one chained wide s8 dot (exp/bw_r5_probe.py). "prescale" keeps
    the round-2 aligned-rows path; "int8" remains available where
    bit-faithful s32 accumulation matters more than speed.
    """
    assert x.dtype == jnp.int8 and weight.dtype == jnp.int8
    kw.setdefault("scheme", "scatter")
    return _group_gemm_blockwise(
        x, weight, seqlens, cu_seqlens, x_scale, w_scale,
        num_seq_per_group_avg, **kw,
    )


def reformat_x_scale(x_scale, seqlens, cu_seqlens, num_seq_per_group_avg: int = 32):
    """Reference-layout conversion (hpc/group_gemm.py:8-48): transpose
    [total_seq_pad, K//128] -> [K//128, compact_total_seq_pad] with per-group
    rows padded/compacted to the m-tile.

    Provided for API parity; our kernels consume either layout directly.
    """
    tm = _pick_tm(num_seq_per_group_avg)
    total, kb = x_scale.shape
    g = seqlens.shape[0]
    tiles = cdiv_dyn(seqlens.astype(jnp.int32), tm)
    g_starts = (
        jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(tiles)[:-1]]) * tm
    )
    total_pad = (cdiv(total, tm) + g) * tm
    out, _ = _align_rows(
        x_scale.astype(jnp.float32),
        seqlens.astype(jnp.int32),
        cu_seqlens.astype(jnp.int32),
        g_starts,
        tm,
        total_pad,
    )
    return out.T


__all__ = [
    "group_gemm_fp8",
    "group_gemm_pertensor_int8",
    "group_gemm_pertensor_fp8",
    "group_gemm_blockwise_fp8",
    "group_gemm_blockwise_int8",
    "group_gemm_fp8_scatter",
    "group_gemm_ref",
    "group_gemm_blockwise_ref",
    "reformat_x_scale",
]
