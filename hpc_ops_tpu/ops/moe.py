"""Fused FP8 MoE: routing + gather + grouped GEMMs + act-quant + top-k reduce.

Reference parity: hpc/fuse_moe.py (count_and_gather, reduce, fuse_moe,
fuse_moe_pertensor_fp8, fuse_moe_blockwise_fp8) and the 5-stage pipeline of
src/fuse_moe/fuse_moe.cu:14-60. EP semantics: routing ids are global; local
experts are [rank_ep*E_local, (rank_ep+1)*E_local); off-rank tokens are
dropped locally (topk_pos = -1 -> zero contribution in reduce).

TPU design: the reference's count/gather kernel builds TMA descriptors and
CTA task maps on device; here the same role is played by an argsort-based
gather that lands each expert's tokens directly at *m-tile-aligned* rows, so
the two grouped GEMMs run the flat-tile Pallas kernel with zero repacking
between stages. The reduce is a gather (not scatter-add): each output token
gathers its top-k expert rows — gathers vectorize well on TPU and avoid
atomics entirely. XLA streams the stages back-to-back (the PDL chaining of
the reference is implicit in one jit).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpc_ops_tpu.ops.activation import act_mul_and_quant, act_mul_and_quant_ref
from hpc_ops_tpu.ops.group_gemm import (
    _bw_scatter_tiles,
    _flat_tiles,
    _gg_blockwise_pallas,
    _gg_bw_scatter_pallas,
    gg_blockwise_prescale_aligned,
    _gg_pertensor_pallas,
    _gg_scatter_pallas,
    _pick_tm,
    cdiv_dyn,
)
from hpc_ops_tpu.ops.quant import FP8_DTYPE, blockwise_fp8_quant
from hpc_ops_tpu.utils.common import cdiv, interpret_default


class GatherResult(NamedTuple):
    x_gathered: jax.Array  # [rows_pad, H] expert-grouped (tile-aligned rows)
    topk_pos: jax.Array  # [S, K] int32 row index (or -1 if dropped)
    seqlens: jax.Array  # [E] tokens per local expert
    cu_seqlens: jax.Array  # [E+1]
    tiles: jax.Array  # [E] m-tiles per expert
    cu_tiles: jax.Array  # [E+1]
    grp: jax.Array  # flat-tile -> expert
    row_blk: jax.Array  # flat-tile -> row block
    new_row_valid: jax.Array  # [S*K] bool


def _gather_aligned(x, topk_ids, num_expert: int, rank_ep: int, tm: int):
    """Sort (token, k) pairs by local expert; place rows tile-aligned."""
    s, k = topk_ids.shape
    flat = topk_ids.reshape(-1).astype(jnp.int32) - rank_ep * num_expert
    valid = (flat >= 0) & (flat < num_expert)
    key = jnp.where(valid, flat, num_expert)
    order = jnp.argsort(key, stable=True)  # sorted position -> flat idx

    seqlens = jnp.bincount(key, length=num_expert + 1)[:num_expert].astype(jnp.int32)
    cu = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(seqlens).astype(jnp.int32)]
    )
    tiles = cdiv_dyn(seqlens, tm)
    cu_tiles = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(tiles).astype(jnp.int32)]
    )

    total_tiles_max = cdiv(s * k, tm) + num_expert
    rows_pad = (total_tiles_max + 1) * tm  # +1 trash tile for the GEMM

    # sorted position j belongs to expert e = key[order[j]];
    # aligned row = cu_tiles[e]*tm + (j - cu[e])
    j = jnp.arange(s * k, dtype=jnp.int32)
    e = key[order]
    e_c = jnp.minimum(e, num_expert - 1)
    aligned = cu_tiles[e_c] * tm + (j - cu[e_c])
    aligned = jnp.where(e < num_expert, aligned, rows_pad - 1)

    xg = (
        jnp.zeros((rows_pad, x.shape[1]), x.dtype)
        .at[aligned]
        .set(jnp.where((e < num_expert)[:, None], x[order // k], 0), mode="drop")
    )

    # topk_pos: flat (token,k) -> aligned row
    inv = jnp.argsort(order)  # flat idx -> sorted position
    pos = aligned[inv]
    topk_pos = jnp.where(valid, pos, -1).reshape(s, k)

    grp, row_blk, _, _ = _flat_tiles(seqlens, tm, total_tiles_max)
    return GatherResult(
        xg, topk_pos, seqlens, cu, tiles, cu_tiles, grp, row_blk, valid
    )


def _route_aligned(topk_ids, num_expert: int, rank_ep: int, tm: int):
    """Routing metadata only — no token materialization (reference cp_async
    path: count_and_build_indices, src/fuse_moe/cp_async/count.cu). Returns
    (row_idx [num_tiles*tm] int32 source token per aligned slot, -1 empty;
    topk_pos [S, K]; seqlens; grp [num_tiles])."""
    s, k = topk_ids.shape
    flat = topk_ids.reshape(-1).astype(jnp.int32) - rank_ep * num_expert
    valid = (flat >= 0) & (flat < num_expert)
    key = jnp.where(valid, flat, num_expert)
    order = jnp.argsort(key, stable=True)

    seqlens = jnp.bincount(key, length=num_expert + 1)[:num_expert].astype(jnp.int32)
    cu = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(seqlens).astype(jnp.int32)]
    )
    tiles = cdiv_dyn(seqlens, tm)
    cu_tiles = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(tiles).astype(jnp.int32)]
    )
    num_tiles = cdiv(s * k, tm) + num_expert

    j = jnp.arange(s * k, dtype=jnp.int32)
    e = key[order]
    e_c = jnp.minimum(e, num_expert - 1)
    aligned = cu_tiles[e_c] * tm + (j - cu[e_c])
    aligned = jnp.where(e < num_expert, aligned, num_tiles * tm)

    row_idx = (
        jnp.full((num_tiles * tm + 1,), -1, jnp.int32)
        .at[aligned]
        .set(jnp.where(e < num_expert, (order // k).astype(jnp.int32), -1),
             mode="drop")[:-1]
    )
    inv = jnp.argsort(order)
    topk_pos = jnp.where(valid, aligned[inv], -1).reshape(s, k)

    grp, _, _, _ = _flat_tiles(seqlens, tm, num_tiles)
    return row_idx, topk_pos, seqlens, cu, tiles, cu_tiles, grp


def count_and_gather(
    x,
    topk_ids,
    num_expert: int,
    rank_ep: int,
    intermediate_size: int = 0,
    num_seq_per_group_avg: int = 32,
):
    """Reference-compatible gather (hpc/fuse_moe.py:8-85): returns the
    expert-compacted token buffer plus routing metadata.

    Returns (output [S*K, H], topk_pos [S*K] int32 (-1 dropped), seqlens [E],
    cu_seqlens [E+1], tiles [E], cu_tiles [E+1]).
    (The reference additionally returns a group-GEMM workspace and TMA
    descriptors — TPU needs neither.)
    """
    s, k = topk_ids.shape
    flat = topk_ids.reshape(-1).astype(jnp.int32) - rank_ep * num_expert
    valid = (flat >= 0) & (flat < num_expert)
    key = jnp.where(valid, flat, num_expert)
    order = jnp.argsort(key, stable=True)
    seqlens = jnp.bincount(key, length=num_expert + 1)[:num_expert].astype(jnp.int32)
    cu = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(seqlens).astype(jnp.int32)]
    )
    tm = _pick_tm(num_seq_per_group_avg)
    tiles = cdiv_dyn(seqlens, tm)
    cu_tiles = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(tiles).astype(jnp.int32)]
    )
    xg = jnp.where(valid[order, None], x[order // k], 0)
    inv = jnp.argsort(order)
    topk_pos = jnp.where(valid, inv.astype(jnp.int32), -1)
    return xg, topk_pos, seqlens, cu, tiles, cu_tiles


def reduce(x, topk_pos, topk_scale, shared_output=None, impl: str = "auto"):
    """Top-k weighted combine (hpc/fuse_moe.py:88-130):
    out[s] = sum_k topk_scale[s,k] * x[topk_pos[s,k]] (+ shared_output[s]).
    topk_pos < 0 contributes zero. Returns [S, H] bf16.

    impl="auto" runs the Pallas gather-combine kernel (`_reduce_kernel`):
    the jnp loop below re-reads the f32 accumulator per expert slice
    (K x 3 HBM passes over [S, H]) and its row gathers do not fuse —
    measured 3.5ms at 4096 tokens x top-8 x h4096, ~10x over the byte
    floor, the largest single stage of the large-batch MoE pipeline
    (results/moe_r5_clean.jsonl). The kernel gathers the K expert rows of
    a token tile with per-row DMAs (double-buffered across tiles, the
    scatter-GEMM's proven pattern) and accumulates in VMEM: bytes touched
    once. impl="ref" keeps the jnp path (the oracle in tests).
    """
    s, k = topk_pos.shape
    h = x.shape[-1]
    if impl == "auto" and not interpret_default() and h % 128 == 0 and k <= 16:
        return _reduce_pallas(x, topk_pos, topk_scale, shared_output)
    out = (
        jnp.zeros((s, h), jnp.float32)
        if shared_output is None
        else shared_output.astype(jnp.float32)
    )
    for j in range(k):
        pos = topk_pos[:, j]
        rows = x[jnp.maximum(pos, 0)].astype(jnp.float32)
        w = jnp.where(pos >= 0, topk_scale[:, j].astype(jnp.float32), 0.0)
        # select-then-multiply: unwritten GEMM rows may hold garbage (even
        # NaN), and NaN * 0 would poison the sum — the where discards it.
        out = out + jnp.where((pos >= 0)[:, None], rows * w[:, None], 0.0)
    return out.astype(jnp.bfloat16)


def _reduce_kernel(pos_hbm_ref, x_hbm_ref, sc_ref, vld_ref, sh_ref, o_ref,
                   gbuf, pos_smem, psem, sem,
                   *, tm: int, k: int, has_shared: bool):
    """Gather-combine: tile t owns tm tokens; their tm*k expert rows are
    DMA'd from HBM, double-buffered across tiles, and combined with one
    fma per expert slot. The row indices themselves stream HBM->SMEM per
    tile (a whole-array scalar prefetch is 4*S*K bytes — 128KB at 4096
    tokens x top-8 — and exceeds SMEM). Slots with pos < 0 gather row 0
    and are discarded by an explicit validity select (NaN-safe)."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    def load_pos(ti, slot):
        # pos is [nt, 1, tm*k]: the leading dim stays untiled so a
        # 1-slice is legal wherever the compiler places the array
        cp = pltpu.make_async_copy(
            pos_hbm_ref.at[ti], pos_smem.at[slot], psem.at[slot]
        )
        cp.start()
        cp.wait()

    def start_gather(ti, slot):
        copies = []
        for r in range(tm):
            for j in range(k):
                idx = jnp.maximum(pos_smem[slot, 0, r * k + j], 0)
                c = pltpu.make_async_copy(
                    x_hbm_ref.at[idx], gbuf.at[slot, r * k + j], sem.at[slot]
                )
                c.start()
                copies.append(c)
        return copies

    @pl.when(t == 0)
    def _():
        load_pos(0, 0)
        for c in start_gather(0, 0):
            c.wait()

    @pl.when(t + 1 < nt)
    def _():
        load_pos(t + 1, (t + 1) % 2)
        start_gather(t + 1, (t + 1) % 2)

    @pl.when(t > 0)
    def _():
        for r in range(tm * k):
            pltpu.make_async_copy(
                x_hbm_ref.at[0], gbuf.at[t % 2, r], sem.at[t % 2]
            ).wait()

    # stay in the gathered [tm, k, h//128, 128] layout end-to-end — a
    # flatten to [tm, k, h] is a full relayout per tile
    g = gbuf[t % 2].reshape(tm, k, gbuf.shape[2], 128)
    acc = sh_ref[...].astype(jnp.float32) if has_shared else None
    for j in range(k):
        # select-then-add: a dropped slot's gathered row may be garbage
        # (even NaN) and NaN * 0 would poison the sum
        part = jnp.where(
            vld_ref[:, j:j + 1][:, :, None] > 0,
            g[:, j].astype(jnp.float32) * sc_ref[:, j:j + 1][:, :, None],
            0.0,
        )
        acc = part if acc is None else acc + part
    o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def _reduce_pallas(x, topk_pos, topk_scale, shared_output=None):
    import functools as _ft

    s, k = topk_pos.shape
    h = x.shape[-1]
    # tile small enough that the double-buffered gather slab fits VMEM
    tm = 64
    while tm > 8 and 2 * tm * k * h * x.dtype.itemsize > (10 << 20):
        tm //= 2
    sp = cdiv(s, tm) * tm
    pos = jnp.pad(
        topk_pos.reshape(-1), (0, (sp - s) * k), constant_values=-1
    ).reshape(sp // tm, 1, tm * k)
    sc = jnp.where(topk_pos >= 0, topk_scale.astype(jnp.float32), 0.0)
    sc = jnp.pad(sc, ((0, sp - s), (0, 128 - k)))
    vld = jnp.pad(
        (topk_pos >= 0).astype(jnp.float32), ((0, sp - s), (0, 128 - k))
    )
    has_shared = shared_output is not None
    if has_shared:
        sh = jnp.pad(shared_output, ((0, sp - s), (0, 0))).reshape(
            sp, h // 128, 128
        )
    else:
        sh = jnp.zeros((8, h // 128, 128), jnp.bfloat16)  # dummy block

    out = pl.pallas_call(
        _ft.partial(_reduce_kernel, tm=tm, k=k, has_shared=has_shared),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(sp // tm,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((tm, 128), lambda t: (t, 0)),
                pl.BlockSpec((tm, 128), lambda t: (t, 0)),
                pl.BlockSpec(
                    (tm, h // 128, 128) if has_shared else (8, h // 128, 128),
                    (lambda t: (t, 0, 0))
                    if has_shared
                    else (lambda t: (0, 0, 0)),
                ),
            ],
            out_specs=pl.BlockSpec((tm, h // 128, 128), lambda t: (t, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, tm * k, h // 128, 128), x.dtype),
                pltpu.SMEM((2, 1, tm * k), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((sp, h // 128, 128), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(pos.astype(jnp.int32), x.reshape(x.shape[0], h // 128, 128),
      sc, vld, sh)
    return out.reshape(sp, h)[:s]


def fuse_moe_pertensor_fp8(
    x,
    gate_up_weight,
    down_weight,
    gate_up_scale,
    down_scale,
    act_and_mul_scale,
    topk_ids,
    topk_scale,
    rank_ep: int,
    num_expert_total: int,
    use_bf16_mul: bool = True,
    shared_output=None,
    *,
    num_seq_per_group_avg: int | None = None,
    impl: str = "auto",
    gate_up_interleaved: bool = False,
):
    """Per-tensor-scale FP8 fused MoE forward.

    x: [S, H] fp8; gate_up_weight: [E_local, 2I, H] fp8; down_weight:
    [E_local, H, I] fp8; gate_up_scale/down_scale: [E_local] f32;
    act_and_mul_scale: [1] f32; topk_ids/topk_scale: [S, K].
    Returns [S, H] bf16.

    ``gate_up_interleaved=True`` (int8 weights only): gate_up_weight was
    pre-shuffled with :func:`interleave_gate_up` — the gate-up GEMM then
    computes silu(gate)*up*act_and_mul_scale -> int8 in its epilogue (no
    bf16 intermediate or separate activation launch) and the down GEMM
    consumes the tile-aligned result with plain block DMAs (no row
    gather). This is the serving fast path; the default keeps the
    reference's 5-stage layout (plain [gate; up] weight rows).
    """
    e_local = gate_up_weight.shape[0]
    if num_seq_per_group_avg is None:
        s_, k_ = topk_ids.shape
        # expected rows per LOCAL expert: off-rank tokens are dropped, so
        # divide by the GLOBAL expert count (s*k*(e_local/e_total)/e_total)
        num_seq_per_group_avg = max(s_ * k_ // max(num_expert_total, 1), 1)
    tm = _pick_tm(num_seq_per_group_avg, x.shape[1])

    if impl in ("auto", "scatter"):
        # Low-latency scatter pipeline (reference cp_async fuse_moe,
        # src/fuse_moe/cp_async/fuse_moe.cu:53-100): routing builds only an
        # index vector; both GEMMs gather their rows in-kernel, so the
        # expert-grouped token copy is never materialized in HBM.
        interp = interpret_default()
        row_idx, topk_pos, seqlens, cu, tiles, cu_tiles, grp = _route_aligned(
            topk_ids, e_local, rank_ep, tm
        )
        nvt = cu_tiles[-1]  # tiles holding real rows; the rest are skipped
        tn_gu = min(512, gate_up_weight.shape[1])
        if (
            gate_up_interleaved
            and down_weight.dtype == jnp.int8
            and gate_up_weight.shape[1] % tn_gu == 0
        ):
            down_in = _gg_scatter_pallas(
                x, gate_up_weight, gate_up_scale, row_idx, grp,
                tm, tn_gu, interpret=interp, num_valid_tiles=nvt,
                act_fuse=True, act_scale=act_and_mul_scale,
                use_bf16_mul=use_bf16_mul, out_dtype=jnp.int8,
            )  # [(nt+1)*tm, I] int8, trash tile appended
            nt = grp.shape[0]
            ar = jnp.arange(nt, dtype=jnp.int32)
            row_blk = jnp.where(ar < nvt, ar, nt)
            i_sz = down_weight.shape[2]
            down = _gg_pertensor_pallas(
                down_in, down_weight, down_scale, grp, row_blk,
                tm, min(512, down_weight.shape[1]),
                min(2048, ((i_sz + 511) // 512) * 512),
                interpret=interp, num_valid_tiles=nvt,
            )
            return reduce(down, topk_pos, topk_scale, shared_output)
        gate_up = _gg_scatter_pallas(
            x, gate_up_weight, gate_up_scale, row_idx, grp,
            tm, tn_gu, interpret=interp,
            num_valid_tiles=nvt,
        )
        down_in = act_mul_and_quant(
            gate_up, act_and_mul_scale, use_bf16_mul,
            out_dtype=jnp.int8 if down_weight.dtype == jnp.int8 else FP8_DTYPE,
            num_valid=nvt * tm,  # skip alignment-padding rows
        )
        ident = jnp.arange(row_idx.shape[0], dtype=jnp.int32)
        down = _gg_scatter_pallas(
            down_in, down_weight, down_scale, ident, grp,
            tm, min(512, down_weight.shape[1]), interpret=interp,
            num_valid_tiles=nvt,
        )
        return reduce(down, topk_pos, topk_scale, shared_output)

    g = _gather_aligned(x, topk_ids, e_local, rank_ep, tm)

    if impl == "ref":
        gate_up = _naive_group_gemm(g.x_gathered, gate_up_weight, g, gate_up_scale, tm)
        down_in = act_mul_and_quant(
            gate_up, act_and_mul_scale, use_bf16_mul,
            out_dtype=jnp.int8 if down_weight.dtype == jnp.int8 else FP8_DTYPE,
            impl="ref",
        )
        down = _naive_group_gemm(down_in, down_weight, g, down_scale, tm)
    else:
        interp = interpret_default()
        nvt = g.cu_tiles[-1]
        gate_up = _gg_pertensor_pallas(
            g.x_gathered, gate_up_weight, gate_up_scale, g.grp, g.row_blk,
            tm, 256, min(512, gate_up_weight.shape[-1]), interpret=interp,
            num_valid_tiles=nvt,
        )
        down_in = act_mul_and_quant(
            gate_up, act_and_mul_scale, use_bf16_mul,
            out_dtype=jnp.int8 if down_weight.dtype == jnp.int8 else FP8_DTYPE,
        )
        down = _gg_pertensor_pallas(
            down_in, down_weight, down_scale, g.grp, g.row_blk,
            tm, 256, min(512, down_weight.shape[-1]), interpret=interp,
            num_valid_tiles=nvt,
        )
    return reduce(down, g.topk_pos, topk_scale, shared_output)


def fuse_moe(
    x,
    gate_up_weight,
    down_weight,
    gate_up_scale,
    down_scale,
    act_and_mul_scale,
    topk_ids,
    topk_scale,
    rank_ep: int,
    num_expert_total: int,
    use_bf16_mul: bool = True,
    shared_output=None,
    **kw,
):
    """Reference alias for the per-tensor FP8 pipeline (hpc/fuse_moe.py:136)."""
    return fuse_moe_pertensor_fp8(
        x,
        gate_up_weight,
        down_weight,
        gate_up_scale,
        down_scale,
        act_and_mul_scale,
        topk_ids,
        topk_scale,
        rank_ep,
        num_expert_total,
        use_bf16_mul,
        shared_output,
        **kw,
    )


def fuse_moe_pertensor_int8(
    x,
    gate_up_weight,
    down_weight,
    gate_up_scale,
    down_scale,
    act_and_mul_scale,
    topk_ids,
    topk_scale,
    rank_ep: int,
    num_expert_total: int,
    use_bf16_mul: bool = True,
    shared_output=None,
    **kw,
):
    """Per-tensor INT8 fused MoE (TPU-native extension of reference op #10).

    Same pipeline as :func:`fuse_moe_pertensor_fp8` with int8 x / weights:
    both grouped GEMMs run the MXU's native s8 x s8 -> s32 path (v5e has no
    native fp8; int8 measures ~1.7x the fp8-upconvert path). The
    activation stage re-quantizes to int8 (`act_and_mul_scale` maps the
    activation range onto [-127, 127]); gate_up_scale/down_scale fold the
    operand scales as in the fp8 variant.
    """
    assert x.dtype == jnp.int8
    assert gate_up_weight.dtype == jnp.int8 and down_weight.dtype == jnp.int8
    return fuse_moe_pertensor_fp8(
        x,
        gate_up_weight,
        down_weight,
        gate_up_scale,
        down_scale,
        act_and_mul_scale,
        topk_ids,
        topk_scale,
        rank_ep,
        num_expert_total,
        use_bf16_mul,
        shared_output,
        **kw,
    )


def fuse_moe_blockwise_fp8(
    x,
    x_scale,
    gate_up_weight,
    gate_up_weight_scale,
    down_weight,
    down_weight_scale,
    topk_ids,
    topk_scale,
    rank_ep: int,
    num_expert_total: int,
    shared_output=None,
    *,
    num_seq_per_group_avg: int = 32,
    scheme: str = "scatter",
):
    """Blockwise-scale FP8 fused MoE forward.

    x: [S, H] fp8 with x_scale [S, H//128] f32 (natural layout);
    gate_up_weight_scale: [E_local, 2I//128, ceil(H/128) pad4];
    down_weight_scale: [E_local, H//128, ceil(I/128) pad4].
    Returns [S, H] bf16.

    ``scheme``: "scatter" (default, the fast path — in-kernel row gather
    + wide bf16 dots with both scale sets folded into operands, see
    group_gemm._gg_bw_scatter_kernel), "prescale" (round-2 aligned-rows
    path) or "fp8" (in-kernel factored operand scaling).
    """
    if scheme == "scatter":
        return _fuse_moe_blockwise_scatter(
            x, x_scale, gate_up_weight, gate_up_weight_scale, down_weight,
            down_weight_scale, topk_ids, topk_scale, rank_ep, shared_output,
            num_seq_per_group_avg, quant=blockwise_fp8_quant,
        )
    e_local = gate_up_weight.shape[0]
    h = x.shape[1]
    interm2 = gate_up_weight.shape[1]
    tm = _pick_tm(num_seq_per_group_avg)
    g = _gather_aligned(x, topk_ids, e_local, rank_ep, tm)
    sx_g = _gather_scale_aligned(x_scale, topk_ids, e_local, rank_ep, tm, g)

    interp = interpret_default()
    kb_h = h // 128

    def gg(x_al, w, sx, sw, kb, sch):
        if sch == "prescale":
            return gg_blockwise_prescale_aligned(
                x_al, w, sx, sw[:, :, :kb], g.grp, g.row_blk, tm, 256,
                interpret=interp, num_valid_tiles=g.cu_tiles[-1],
            )
        return _gg_blockwise_pallas(
            x_al, w, sx, sw[:, :, :kb], g.grp, g.row_blk, tm, 256,
            interpret=interp, num_valid_tiles=g.cu_tiles[-1],
            scheme=sch,
        )

    gate_up = gg(
        g.x_gathered, gate_up_weight, sx_g, gate_up_weight_scale, kb_h,
        scheme,
    )
    # act + blockwise re-quant of the intermediate
    interm = interm2 // 2
    gate = gate_up[:, :interm].astype(jnp.float32)
    up = gate_up[:, interm:].astype(jnp.float32)
    act = gate * jax.nn.sigmoid(gate) * up
    down_in, down_in_scale = blockwise_fp8_quant(act)
    kb_i = interm // 128
    down = gg(
        down_in, down_weight, down_in_scale + 1e-8, down_weight_scale,
        kb_i, scheme,
    )
    return reduce(down, g.topk_pos, topk_scale, shared_output)


def _fuse_moe_blockwise_scatter(
    x, x_scale, gate_up_weight, gate_up_weight_scale, down_weight,
    down_weight_scale, topk_ids, topk_scale, rank_ep, shared_output,
    num_seq_per_group_avg, quant,
):
    """Round-5 blockwise pipeline on the scatter grouped GEMM (see
    group_gemm._gg_bw_scatter_kernel): routing builds only an index
    vector, both GEMMs gather/consume tile-aligned rows in-kernel — the
    round-2 path's XLA token scatter (~330us at 1K tokens) and x-scale
    alignment passes are gone."""
    e_local = gate_up_weight.shape[0]
    h = x.shape[1]
    interm = gate_up_weight.shape[1] // 2
    interp = interpret_default()
    tm0 = _pick_tm(num_seq_per_group_avg, h)
    # one tm must satisfy BOTH GEMMs' VMEM budgets (rows are tile-aligned
    # once, at routing)
    tm_a, tn_gu = _bw_scatter_tiles(tm0, 256, h, gate_up_weight.shape[1])
    tm_b, tn_dn = _bw_scatter_tiles(tm0, 256, interm, down_weight.shape[1])
    tm = min(tm_a, tm_b)
    row_idx, topk_pos, seqlens, cu, tiles, cu_tiles, grp = _route_aligned(
        topk_ids, e_local, rank_ep, tm
    )
    nvt = cu_tiles[-1]
    gate_up = _gg_bw_scatter_pallas(
        x, gate_up_weight, x_scale, gate_up_weight_scale, row_idx, grp,
        tm, tn_gu, num_valid_tiles=nvt, interpret=interp,
    )[:, :gate_up_weight.shape[1]]
    gate = gate_up[:, :interm].astype(jnp.float32)
    up = gate_up[:, interm:].astype(jnp.float32)
    act = gate * jax.nn.sigmoid(gate) * up
    down_in, down_in_scale = quant(act)
    ident = jnp.arange(row_idx.shape[0], dtype=jnp.int32)
    down = _gg_bw_scatter_pallas(
        down_in, down_weight, down_in_scale + 1e-8, down_weight_scale,
        ident, grp, tm, tn_dn, num_valid_tiles=nvt, interpret=interp,
    )[:, :down_weight.shape[1]]
    return reduce(down, topk_pos, topk_scale, shared_output)


def fuse_moe_blockwise(x, x_scale, *args, **kw):
    """Reference alias (hpc/fuse_moe.py:232)."""
    return fuse_moe_blockwise_fp8(x, x_scale, *args, **kw)


def fuse_moe_blockwise_int8(
    x,
    x_scale,
    gate_up_weight,
    gate_up_weight_scale,
    down_weight,
    down_weight_scale,
    topk_ids,
    topk_scale,
    rank_ep: int,
    num_expert_total: int,
    shared_output=None,
    *,
    num_seq_per_group_avg: int = 32,
    scheme: str = "scatter",
):
    """Blockwise-scale INT8 fused MoE forward (TPU-native extension).

    Same contract as :func:`fuse_moe_blockwise_fp8` but with int8 codes
    (quantize with :func:`hpc_ops_tpu.ops.quant.blockwise_int8_quant`).

    ``scheme``: "prescale" (default) folds the blockwise scales into bf16
    operands — measured the fast path: the "int8" scheme's per-128-group
    f32 promotion (s8xs8->s32 MXU dots + scale-accumulate, DeepGEMM's
    structure) runs on the VPU at ~1:1 with the MXU dot time, so the
    native-s8 rate is unreachable for per-group promotion. "int8" remains
    available where bit-faithful s32 accumulation matters more than speed.
    """
    from hpc_ops_tpu.ops.quant import blockwise_int8_quant

    if scheme == "scatter":
        return _fuse_moe_blockwise_scatter(
            x, x_scale, gate_up_weight, gate_up_weight_scale, down_weight,
            down_weight_scale, topk_ids, topk_scale, rank_ep, shared_output,
            num_seq_per_group_avg, quant=blockwise_int8_quant,
        )
    e_local = gate_up_weight.shape[0]
    h = x.shape[1]
    interm2 = gate_up_weight.shape[1]
    tm = _pick_tm(num_seq_per_group_avg)
    g = _gather_aligned(x, topk_ids, e_local, rank_ep, tm)
    sx_g = _gather_scale_aligned(x_scale, topk_ids, e_local, rank_ep, tm, g)

    interp = interpret_default()
    kb_h = h // 128

    def gg(x_al, w, sx, sw, kb):
        if scheme == "prescale":
            return gg_blockwise_prescale_aligned(
                x_al, w, sx, sw[:, :, :kb], g.grp, g.row_blk, tm, 256,
                interpret=interp, num_valid_tiles=g.cu_tiles[-1],
            )
        return _gg_blockwise_pallas(
            x_al, w, sx, sw[:, :, :kb], g.grp, g.row_blk, tm, 256,
            interpret=interp, num_valid_tiles=g.cu_tiles[-1], scheme=scheme,
        )

    gate_up = gg(g.x_gathered, gate_up_weight, sx_g, gate_up_weight_scale, kb_h)
    interm = interm2 // 2
    gate = gate_up[:, :interm].astype(jnp.float32)
    up = gate_up[:, interm:].astype(jnp.float32)
    act = gate * jax.nn.sigmoid(gate) * up
    down_in, down_in_scale = blockwise_int8_quant(act)
    kb_i = interm // 128
    down = gg(down_in, down_weight, down_in_scale + 1e-8, down_weight_scale, kb_i)
    return reduce(down, g.topk_pos, topk_scale, shared_output)


def _gather_scale_aligned(x_scale, topk_ids, e_local, rank_ep, tm, g: GatherResult):
    """Gather per-token blockwise scales into the same aligned layout."""
    s, k = topk_ids.shape
    flat = topk_ids.reshape(-1).astype(jnp.int32) - rank_ep * e_local
    valid = (flat >= 0) & (flat < e_local)
    key = jnp.where(valid, flat, e_local)
    order = jnp.argsort(key, stable=True)
    e = key[order]
    rows_pad = g.x_gathered.shape[0]
    j = jnp.arange(s * k, dtype=jnp.int32)
    e_c = jnp.minimum(e, e_local - 1)
    aligned = g.cu_tiles[e_c] * tm + (j - g.cu_seqlens[e_c])
    aligned = jnp.where(e < e_local, aligned, rows_pad - 1)
    return (
        jnp.zeros((rows_pad, x_scale.shape[1]), jnp.float32)
        .at[aligned]
        .set(jnp.where((e < e_local)[:, None], x_scale[order // k], 0), mode="drop")
    )


def _naive_group_gemm(xg, w, g: GatherResult, scale, tm):
    """jnp oracle over the aligned layout (for impl='ref')."""
    rows = xg.shape[0]
    e = w.shape[0]
    out = jnp.zeros((rows, w.shape[1]), jnp.float32)
    xf = xg.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    for ei in range(e):
        s = int(g.cu_tiles[ei]) * tm
        l = int(g.seqlens[ei])
        if l == 0:
            continue
        out = out.at[s : s + l].set((xf[s : s + l] @ wf[ei].T) * scale[ei])
    return out.astype(jnp.bfloat16)


def interleave_gate_up(w, tn: int = 512):
    """Pre-shuffle [E, 2I, K] gate-up weights for the fused-act GEMM.

    Output n-block j (tn rows) holds gate rows [j*tn/2, (j+1)*tn/2) followed
    by the matching up rows, so the GEMM epilogue can apply
    silu(gate)*up on its own accumulator tile. One-time transform — do it
    at weight-load, never in the hot path.
    """
    e, n2, k = w.shape
    i = n2 // 2
    h2 = min(tn, n2) // 2
    assert i % h2 == 0, (i, tn)
    wg = w[:, :i].reshape(e, i // h2, h2, k)
    wu = w[:, i:].reshape(e, i // h2, h2, k)
    return jnp.stack([wg, wu], axis=2).reshape(e, n2, k)


def count_and_build_indices(topk_ids, num_expert: int, rank_ep: int,
                            num_seq_per_group_avg: int | None = None):
    """Routing metadata without token materialization (reference
    src/fuse_moe/cp_async/count.cu count_and_build_indices): returns
    (row_indices, topk_pos, seqlens, cu_seqlens, tiles, cu_tiles, grp) —
    the inputs of :func:`hpc_ops_tpu.ops.group_gemm.group_gemm_fp8_scatter`.
    """
    s_, k_ = topk_ids.shape
    if num_seq_per_group_avg is None:
        num_seq_per_group_avg = max(s_ * k_ // max(num_expert, 1), 1)
    tm = _pick_tm(num_seq_per_group_avg)
    return _route_aligned(topk_ids, num_expert, rank_ep, tm)


__all__ = [
    "count_and_gather",
    "count_and_build_indices",
    "interleave_gate_up",
    "reduce",
    "fuse_moe",
    "fuse_moe_pertensor_fp8",
    "fuse_moe_pertensor_int8",
    "fuse_moe_blockwise_fp8",
    "fuse_moe_blockwise_int8",
    "fuse_moe_blockwise",
]
