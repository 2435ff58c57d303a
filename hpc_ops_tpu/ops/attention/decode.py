"""Paged decode attention (BF16 / FP8) — Pallas TPU kernel + dispatch.

Reference parity: hpc/attention.py:341-517 (attention_decode_bf16 /
attention_decode_fp8): GQA decode over a paged KV cache with MTP draft
tokens (mtp 0..4), quant schemes per QuantType, and a scheduled task-map
mode.

TPU design (vs. the reference's CUDA split-k CTA scheduling,
SURVEY.md §3.1): a TPU core executes its grid sequentially with pipelined
DMA, so "split-k across CTAs" is replaced by a (batch, kv_head) grid whose
programs walk their KV chunks in an inline loop, double-buffer DMA-ing
pages while the previous chunk computes and prefetching the next program's
first chunk across the grid-step boundary. Load imbalance between requests
costs nothing: each program runs exactly ceil(kv_len/chunk) iterations.

Scale handling: all *per-tensor* scales are folded outside the kernel
(q <- q * qscale * kscale / sqrt(D); out <- out * vscale), so the BF16 and
FP8-per-tensor kernels are one kernel that differs only in the KV dtype
upcast — an 8-bit cache halves the page-DMA bytes, which is the entire win
on a bandwidth-bound decode. The per-token-per-head K-scale scheme
(QuantType 0) additionally DMAs scale pages alongside KV pages.

8-bit cache formats on v5e (no native fp8; fp8-typed arrays DMA ~6-10x
below byte rate and expand to 32-bit words in VMEM):
  * fp8 e4m3 caches (reference contract) are bitcast to int8 at the
    wrapper boundary and decoded bit-exactly in-kernel
    (``e4m3_bits_to_bf16``) — full byte-rate DMA, reference numerics.
  * int8 caches (TPU-native fast path, ``quantize_kv_fused_int8``) convert
    on the VPU directly.
Either way the serving fast path is the FUSED layout (K|V of a page in one
DMA slab): decode is DMA-issue-bound (~20ns/descriptor) before it is
byte-bound, so halving descriptors is what converts halved bytes into
halved wall time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpc_ops_tpu.config import QuantType
from hpc_ops_tpu.ops.attention.paging import MultiPageCopy, nhd_to_hnd
from hpc_ops_tpu.ops.attention.reference import MASK_VALUE, attention_decode_ref
from hpc_ops_tpu.utils.common import (
    cdiv,
    e4m3_bits_to_f32_fast,
    interpret_default,
    round_up,
)


def _kv_bits(pages):
    """fp8 page array -> (int8 bit view, True); passthrough otherwise."""
    if pages.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        return jax.lax.bitcast_convert_type(pages, jnp.int8), True
    return pages, False


def _upk(x, e4m3: bool):
    """KV tile -> bf16. e4m3=True: tile holds fp8 BITS in int8 (fp8
    payloads travel byte-packed — v5e DMAs fp8-typed arrays ~6-10x below
    byte rate); decode is bit-exact (e4m3_bits_to_bf16)."""
    if e4m3:
        return e4m3_bits_to_f32_fast(x).astype(jnp.bfloat16)
    return x.astype(jnp.bfloat16)

_LANES = 128


def _decode_kernel(
    # scalar prefetch
    kv_lens_ref,  # [B] effective kv length
    block_tbl_ref,  # [B * max_blocks] flattened page table
    scale_ref,  # [1] f32 — sm_scale (x kscale for fp8), folded in-kernel
    # inputs
    q_ref,  # [1, 1, SGP, D] VMEM bf16
    k_pages_ref,  # [Hkv, nb, bs, D] ANY
    v_pages_ref,  # [Hkv, nb, bs, D] ANY
    # outputs
    o_ref,  # [1, 1, SGP, D] VMEM f32
    # scratch
    k_buf,  # [2, pcb, bs, D]
    v_buf,
    sems,  # DMA sems (2, 2)
    m_scr,  # [SGP, LANES] f32
    l_scr,
    acc_scr,  # [SGP, D] f32
    buf_idx_ref,  # SMEM (1,) int32 — persistent double-buffer slot
    *,
    sq: int,
    pcb: int,
    page_size: int,
    max_blocks: int,
    batch: int,
    num_kv_heads: int,
    num_t: int,
    nhd: bool = False,  # pages are the flat NHD view [nb, bs, H*D]
    kv_e4m3: bool = False,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    ck = pcb * page_size  # kv tokens per compute block
    d_k = k_buf.shape[-1]
    d_v = v_buf.shape[-1]

    kv_len = kv_lens_ref[b]
    t_max = jnp.maximum((kv_len + ck - 1) // ck, 1)

    def start_copy(bi, hi, ti, slot):
        # only DMA the pages the sequence actually has in this chunk —
        # full-pcb copies over-fetch up to chunk/kv_len x on skewed batches
        need = jnp.clip(
            (kv_lens_ref[bi] + page_size - 1) // page_size - ti * pcb, 1, pcb
        )
        kc = MultiPageCopy(
            k_pages_ref,
            k_buf,
            sems.at[slot, 0],
            block_tbl_ref,
            head=hi,
            page_start=bi * max_blocks + ti * pcb,
            num_pages=pcb,
            slot=slot,
            num_valid=need,
            nhd_lane_dim=d_k if nhd else None,
        )
        vc = MultiPageCopy(
            v_pages_ref,
            v_buf,
            sems.at[slot, 1],
            block_tbl_ref,
            head=hi,
            page_start=bi * max_blocks + ti * pcb,
            num_pages=pcb,
            slot=slot,
            num_valid=need,
            nhd_lane_dim=d_v if nhd else None,
        )
        return kc, vc

    # First program of the whole grid zeroes the buffers (un-DMA'd tail
    # pages must never hold NaN bits: masked columns contribute p=0 exactly,
    # but 0 * NaN = NaN in the PV dot) and starts its copy into slot 0.
    @pl.when((b == 0) & (h == 0))
    def _():
        k_buf[...] = jnp.zeros_like(k_buf)
        v_buf[...] = jnp.zeros_like(v_buf)
        buf_idx_ref[0] = 0
        kc, vc = start_copy(b, h, 0, 0)
        kc.start()
        vc.start()

    m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    # scale the tiny q tile in-kernel (f32 then back to bf16) — cheaper
    # than a full pre-scaling pass over q in HBM
    q = (q_ref[0, 0].astype(jnp.float32) * scale_ref[0]).astype(jnp.bfloat16)
    sgp = q.shape[0]

    # successor of this (b, h) in the grid walk — its first chunk is
    # prefetched while this program's last chunk computes
    nb_ = jnp.where(h == num_kv_heads - 1, b + 1, b)
    nh = jnp.where(h == num_kv_heads - 1, 0, h + 1)

    def body(t, _, slot=None):
        if slot is None:
            slot = buf_idx_ref[0]
            next_slot = 1 - slot
            is_last_t = t == t_max - 1
            # prefetch the next chunk in the global (b, h, t) chain
            pb = jnp.where(is_last_t, nb_, b)
            ph = jnp.where(is_last_t, nh, h)
            pt = jnp.where(is_last_t, 0, t + 1)
            buf_idx_ref[0] = next_slot
        else:
            # single-chunk grid: slot is the step parity, the successor is
            # always the next (b, h) — no SMEM toggle, no selects
            next_slot = 1 - slot
            pb, ph, pt = nb_, nh, 0

        @pl.when(pb < batch)
        def _():
            kc, vc = start_copy(pb, ph, pt, next_slot)
            kc.start()
            vc.start()

        kc, vc = start_copy(b, h, t, slot)
        kc.wait()
        # bf16 operands keep the MXU at full rate; accumulate in f32.
        k = _upk(k_buf[slot].reshape(ck, k_buf.shape[-1]), kv_e4m3)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [SGP, ck]

        # mask: kv position valid and causal w.r.t. the draft-token row
        kpos = t * ck + jax.lax.broadcasted_iota(jnp.int32, (sgp, ck), 1)
        if sq == 1:
            # no draft tokens: every row attends [0, kv_len) — skip the
            # per-row position math (saves two 32K-element VPU passes/chunk)
            s = jnp.where(kpos < kv_len, s, MASK_VALUE)
        else:
            # row r corresponds to draft index r % sq (rows are g*sq + s)
            row = jax.lax.broadcasted_iota(jnp.int32, (sgp, ck), 0)
            qpos = kv_len - sq + row % sq
            s = jnp.where(kpos <= qpos, s, MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)  # [SGP, 1]
        m_curr = jnp.broadcast_to(m_curr, m_prev.shape)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_next = alpha * l_prev + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape
        )
        m_scr[...] = m_next
        l_scr[...] = l_next

        vc.wait()
        v = _upk(v_buf[slot].reshape(ck, v_buf.shape[-1]), kv_e4m3)
        o_curr = jax.lax.dot(
            p.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + o_curr
        return ()

    if num_t == 1:
        # every sequence fits one compute chunk: no loop machinery at all
        body(0, (), slot=jax.lax.rem(b * num_kv_heads + h, 2))
    else:
        jax.lax.fori_loop(0, t_max, body, (), unroll=False)

    l = l_scr[:, :1]
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def _decode_fused_kernel(
    # scalar prefetch
    kv_lens_ref,  # [B]
    block_tbl_ref,  # [B * max_blocks]
    scale_ref,  # [1] f32
    # inputs
    q_ref,  # [1, 1, SGP, D] VMEM bf16
    kv_pages_ref,  # [Hkv, nb, 2*bs, D] ANY — fused K|V pages
    # outputs
    o_ref,  # [1, 1, SGP, D]
    # scratch
    kv_buf,  # [2, pcb, 2*bs, D]
    sems,  # DMA sems (2,)
    m_scr,
    l_scr,
    acc_scr,
    buf_idx_ref,
    *,
    sq: int,
    pcb: int,
    page_size: int,
    max_blocks: int,
    batch: int,
    num_kv_heads: int,
    num_t: int,
    kv_e4m3: bool = False,
):
    """Fused-layout decode: K and V of a page live in one [2*bs, D] slab
    (rows [0:bs]=K, [bs:2bs]=V), so each page costs ONE DMA descriptor.

    Why: on v5e the paged-decode pipeline saturates the DMA *issue* rate
    (~20ns/descriptor) before HBM bytes at 8-16KB pages — an int8 cache
    through the split layout moves half the bytes in the same wall time.
    Fusing K+V halves descriptors per token and restores the byte win;
    this is the serving engine's native layout (reference keeps split
    K/V caches, hpc/attention.py:341-380 — a deliberate TPU redesign).
    """
    b = pl.program_id(0)
    h = pl.program_id(1)
    ck = pcb * page_size

    kv_len = kv_lens_ref[b]
    t_max = jnp.maximum((kv_len + ck - 1) // ck, 1)

    def start_copy(bi, hi, ti, slot):
        need = jnp.clip(
            (kv_lens_ref[bi] + page_size - 1) // page_size - ti * pcb, 1, pcb
        )
        return MultiPageCopy(
            kv_pages_ref,
            kv_buf,
            sems.at[slot],
            block_tbl_ref,
            head=hi,
            page_start=bi * max_blocks + ti * pcb,
            num_pages=pcb,
            slot=slot,
            num_valid=need,
        )

    @pl.when((b == 0) & (h == 0))
    def _():
        kv_buf[...] = jnp.zeros_like(kv_buf)  # no NaN bits in un-DMA'd tails
        buf_idx_ref[0] = 0
        start_copy(b, h, 0, 0).start()

    m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    q = (q_ref[0, 0].astype(jnp.float32) * scale_ref[0]).astype(jnp.bfloat16)
    sgp = q.shape[0]

    nb_ = jnp.where(h == num_kv_heads - 1, b + 1, b)
    nh = jnp.where(h == num_kv_heads - 1, 0, h + 1)

    def body(t, _, slot=None):
        if slot is None:
            slot = buf_idx_ref[0]
            next_slot = 1 - slot
            is_last_t = t == t_max - 1
            pb = jnp.where(is_last_t, nb_, b)
            ph = jnp.where(is_last_t, nh, h)
            pt = jnp.where(is_last_t, 0, t + 1)
            buf_idx_ref[0] = next_slot
        else:
            next_slot = 1 - slot
            pb, ph, pt = nb_, nh, 0

        @pl.when(pb < batch)
        def _():
            start_copy(pb, ph, pt, next_slot).start()

        start_copy(b, h, t, slot).wait()
        kv = kv_buf[slot]  # [pcb, 2*bs, D]
        k = _upk(kv[:, :page_size, :].reshape(ck, kv.shape[-1]), kv_e4m3)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

        kpos = t * ck + jax.lax.broadcasted_iota(jnp.int32, (sgp, ck), 1)
        if sq == 1:
            s = jnp.where(kpos < kv_len, s, MASK_VALUE)
        else:
            row = jax.lax.broadcasted_iota(jnp.int32, (sgp, ck), 0)
            qpos = kv_len - sq + row % sq
            s = jnp.where(kpos <= qpos, s, MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.broadcast_to(jnp.max(s, axis=1, keepdims=True), m_prev.shape)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_scr[...] = alpha * l_prev + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape
        )
        m_scr[...] = m_next

        v = _upk(kv[:, page_size:, :].reshape(ck, kv.shape[-1]), kv_e4m3)
        o_curr = jax.lax.dot(
            p.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + o_curr
        return ()

    if num_t == 1:
        body(0, (), slot=jax.lax.rem(b * num_kv_heads + h, 2))
    else:
        jax.lax.fori_loop(0, t_max, body, (), unroll=False)

    l = l_scr[:, :1]
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sq", "pages_per_compute_block", "interpret")
)
def _decode_fused_pallas(
    q4,  # [B, Hkv, SGP, D] bf16
    kv_pages,  # [Hkv, nb, 2*bs, D]
    block_ids,
    kv_lens,
    scale,
    sq: int,
    pages_per_compute_block: int,
    interpret: bool = False,
):
    b, hkv, sgp, d = q4.shape
    kv_pages, kv_e4m3 = _kv_bits(kv_pages)
    _, nb, bs2, _ = kv_pages.shape
    bs = bs2 // 2
    dv = kv_pages.shape[-1]
    max_blocks = block_ids.shape[1]
    pcb = pages_per_compute_block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, sgp, d), lambda bi, hi, *_: (bi, hi, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, sgp, dv), lambda bi, hi, *_: (bi, hi, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, pcb, bs2, d), kv_pages.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((sgp, _LANES), jnp.float32),
            pltpu.VMEM((sgp, _LANES), jnp.float32),
            pltpu.VMEM((sgp, dv), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _decode_fused_kernel,
        sq=sq,
        pcb=pcb,
        page_size=bs,
        max_blocks=max_blocks,
        batch=b,
        num_kv_heads=hkv,
        num_t=cdiv(max_blocks, pcb),
        kv_e4m3=kv_e4m3,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, sgp, dv), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        kv_lens,
        jnp.pad(block_ids.reshape(-1), (0, pcb)),
        scale,
        q4,
        kv_pages,
    )


def _decode_nhd_fused_kernel(
    # scalar prefetch
    kv_lens_ref,  # [B]
    block_tbl_ref,  # [B * max_blocks]
    scale_ref,  # [1] f32
    # inputs
    q_ref,  # [1, Hkv, SGP, D] VMEM bf16 — every kv head of request b
    kv_pages_ref,  # [nb, 2*bs, Hkv*D] ANY — slot-leading fused pages
    # outputs
    o_ref,  # [1, Hkv, SGP, D]
    # scratch
    kv_buf,  # [2, pcb, 2*bs, Hkv*D]
    sems,  # DMA sems (2,)
    m_scr,  # [Hkv*SGP, LANES]
    l_scr,  # [Hkv*SGP, LANES]
    acc_scr,  # [Hkv*SGP, Dv]
    buf_idx_ref,
    *,
    sq: int,
    pcb: int,
    page_size: int,
    max_blocks: int,
    batch: int,
    num_kv_heads: int,
    d: int,
    num_t: int,
    kv_e4m3: bool = False,
):
    """Slot-leading fused decode: one DMA descriptor per page moves K|V rows
    of ALL kv heads (pack_kv_fused_nhd). The head-major fused kernel still
    pays one descriptor per (page, head); at int8 slab sizes the pipeline is
    descriptor-ISSUE-bound (~21ns issue vs ~20ns transfer of a 16KB slab),
    so hkv x fewer descriptors makes the read purely transfer-bound. The
    grid is (batch,) — all heads of a request share the chunk's slabs — so
    short-KV work also pays hkv x fewer grid steps. Layout + kernel are a
    TPU redesign of the reference's split per-head caches
    (hpc/attention.py:341-380).
    """
    b = pl.program_id(0)
    ck = pcb * page_size
    hkv = num_kv_heads

    kv_len = kv_lens_ref[b]
    t_max = jnp.maximum((kv_len + ck - 1) // ck, 1)

    def start_copy(bi, ti, slot):
        need = jnp.clip(
            (kv_lens_ref[bi] + page_size - 1) // page_size - ti * pcb, 1, pcb
        )
        return MultiPageCopy(
            kv_pages_ref,
            kv_buf,
            sems.at[slot],
            block_tbl_ref,
            head=None,
            page_start=bi * max_blocks + ti * pcb,
            num_pages=pcb,
            slot=slot,
            num_valid=need,
        )

    @pl.when(b == 0)
    def _():
        kv_buf[...] = jnp.zeros_like(kv_buf)  # no NaN bits in un-DMA'd tails
        buf_idx_ref[0] = 0
        start_copy(0, 0, 0).start()

    m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    sgp = q_ref.shape[2]

    def body(t, _, slot=None):
        if slot is None:
            slot = buf_idx_ref[0]
            next_slot = 1 - slot
            is_last_t = t == t_max - 1
            pb = jnp.where(is_last_t, b + 1, b)
            pt = jnp.where(is_last_t, 0, t + 1)
            buf_idx_ref[0] = next_slot
        else:
            next_slot = 1 - slot
            pb, pt = b + 1, 0

        @pl.when(pb < batch)
        def _():
            start_copy(pb, pt, next_slot).start()

        start_copy(b, t, slot).wait()

        # shared mask geometry for every head
        kpos = t * ck + jax.lax.broadcasted_iota(jnp.int32, (sgp, ck), 1)
        if sq == 1:
            keep = kpos < kv_len
        else:
            row = jax.lax.broadcasted_iota(jnp.int32, (sgp, ck), 0)
            keep = kpos <= kv_len - sq + row % sq

        for h in range(hkv):  # static: per-head lane slice of the slabs
            kh = _upk(
                kv_buf[slot, :, :page_size, pl.ds(h * d, d)].reshape(ck, d),
                kv_e4m3,
            )
            q = (
                q_ref[0, h].astype(jnp.float32) * scale_ref[0]
            ).astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                q, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = jnp.where(keep, s, MASK_VALUE)

            r0 = h * sgp
            m_prev = m_scr[pl.ds(r0, sgp), :]
            l_prev = l_scr[pl.ds(r0, sgp), :]
            m_curr = jnp.broadcast_to(
                jnp.max(s, axis=1, keepdims=True), m_prev.shape
            )
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])
            l_scr[pl.ds(r0, sgp), :] = alpha * l_prev + jnp.broadcast_to(
                jnp.sum(p, axis=1, keepdims=True), l_prev.shape
            )
            m_scr[pl.ds(r0, sgp), :] = m_next

            vh = _upk(
                kv_buf[slot, :, page_size:, pl.ds(h * d, d)].reshape(ck, d),
                kv_e4m3,
            )
            o_curr = jax.lax.dot(
                p.astype(jnp.bfloat16), vh, preferred_element_type=jnp.float32
            )
            acc_scr[pl.ds(r0, sgp), :] = (
                acc_scr[pl.ds(r0, sgp), :] * alpha[:, :1] + o_curr
            )
        return ()

    if num_t == 1:
        body(0, (), slot=jax.lax.rem(b, 2))
    else:
        jax.lax.fori_loop(0, t_max, body, (), unroll=False)

    for h in range(hkv):
        l = l_scr[pl.ds(h * sgp, sgp), :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, h] = (acc_scr[pl.ds(h * sgp, sgp), :] * l_inv).astype(
            o_ref.dtype
        )


@functools.partial(
    jax.jit,
    static_argnames=("sq", "num_kv_heads", "pages_per_compute_block", "interpret"),
)
def _decode_nhd_fused_pallas(
    q4,  # [B, Hkv, SGP, D] bf16
    kv_pages,  # [nb, 2*bs, Hkv*D]
    block_ids,
    kv_lens,
    scale,
    sq: int,
    num_kv_heads: int,
    pages_per_compute_block: int,
    interpret: bool = False,
):
    b, hkv, sgp, d = q4.shape
    kv_pages, kv_e4m3 = _kv_bits(kv_pages)
    nb, bs2, hd = kv_pages.shape
    bs = bs2 // 2
    max_blocks = block_ids.shape[1]
    pcb = pages_per_compute_block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hkv, sgp, d), lambda bi, *_: (bi, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, hkv, sgp, d), lambda bi, *_: (bi, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, pcb, bs2, hd), kv_pages.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((hkv * sgp, _LANES), jnp.float32),
            pltpu.VMEM((hkv * sgp, _LANES), jnp.float32),
            pltpu.VMEM((hkv * sgp, d), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _decode_nhd_fused_kernel,
        sq=sq,
        pcb=pcb,
        page_size=bs,
        max_blocks=max_blocks,
        batch=b,
        num_kv_heads=hkv,
        d=d,
        num_t=cdiv(max_blocks, pcb),
        kv_e4m3=kv_e4m3,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, sgp, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        kv_lens,
        jnp.pad(block_ids.reshape(-1), (0, pcb)),
        scale,
        q4,
        kv_pages,
    )


def _decode_fused_packed_kernel(
    # scalar prefetch
    kv_lens_ref,  # [B]
    block_tbl_ref,  # [B * max_blocks]
    scale_ref,  # [1] f32
    # inputs
    q_ref,  # [R, SGP, D] VMEM — R consecutive (b, h) pairs' q tiles
    kv_pages_ref,  # [Hkv, nb, 2*bs, D] ANY
    # outputs
    o_ref,  # [R, SGP, D]
    # scratch
    kv_buf,  # [2, pcb, 2*bs, D]
    sems,  # DMA sems (2,)
    m_scr,
    l_scr,
    acc_scr,
    buf_idx_ref,
    *,
    sq: int,
    r_pack: int,
    pcb: int,
    page_size: int,
    max_blocks: int,
    batch: int,
    num_kv_heads: int,
    kv_e4m3: bool = False,
):
    """Short-KV decode: R (batch, head) pairs per grid step.

    At KV <= ~1K the per-(b, h) grid pays more in Mosaic grid-step overhead
    (~1-2us/step) than in DMA: 64 req x 8 heads = 512 steps vs ~160us of
    total KV traffic. Packing R pairs into one step cuts steps by R while
    the (r, t) chunk chain keeps the same double-buffered DMA pipeline.
    TPU analog of the reference packing several short requests into one CTA
    bin (assign_task.cu min_process_len), applied to the static grid.
    """
    pid = pl.program_id(0)
    ck = pcb * page_size
    flat0 = pid * r_pack

    def start_copy(flat, ti, slot):
        bi = flat // num_kv_heads
        hi = jax.lax.rem(flat, num_kv_heads)
        need = jnp.clip(
            (kv_lens_ref[bi] + page_size - 1) // page_size - ti * pcb, 1, pcb
        )
        return MultiPageCopy(
            kv_pages_ref,
            kv_buf,
            sems.at[slot],
            block_tbl_ref,
            head=hi,
            page_start=bi * max_blocks + ti * pcb,
            num_pages=pcb,
            slot=slot,
            num_valid=need,
        )

    @pl.when(pid == 0)
    def _():
        kv_buf[...] = jnp.zeros_like(kv_buf)  # no NaN bits in un-DMA'd tails
        buf_idx_ref[0] = 0
        start_copy(0, 0, 0).start()

    total_flat = batch * num_kv_heads

    def r_body(r, _):
        flat = flat0 + r
        kv_len = kv_lens_ref[flat // num_kv_heads]
        t_max = jnp.maximum((kv_len + ck - 1) // ck, 1)

        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

        q = (q_ref[r].astype(jnp.float32) * scale_ref[0]).astype(jnp.bfloat16)
        sgp = q.shape[0]

        # successor of this pack entry in the global (flat, t) chain
        nf = flat + 1

        def body(t, _):
            slot = buf_idx_ref[0]
            next_slot = 1 - slot
            is_last_t = t == t_max - 1
            pf = jnp.where(is_last_t, nf, flat)
            pt = jnp.where(is_last_t, 0, t + 1)
            buf_idx_ref[0] = next_slot

            @pl.when(pf < total_flat)
            def _():
                start_copy(pf, pt, next_slot).start()

            start_copy(flat, t, slot).wait()
            kv = kv_buf[slot]
            k = _upk(kv[:, :page_size, :].reshape(ck, kv.shape[-1]), kv_e4m3)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            kpos = t * ck + jax.lax.broadcasted_iota(jnp.int32, (sgp, ck), 1)
            if sq == 1:
                s = jnp.where(kpos < kv_len, s, MASK_VALUE)
            else:
                row = jax.lax.broadcasted_iota(jnp.int32, (sgp, ck), 0)
                qpos = kv_len - sq + row % sq
                s = jnp.where(kpos <= qpos, s, MASK_VALUE)

            m_prev = m_scr[...]
            l_prev = l_scr[...]
            m_curr = jnp.broadcast_to(
                jnp.max(s, axis=1, keepdims=True), m_prev.shape
            )
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])
            l_scr[...] = alpha * l_prev + jnp.broadcast_to(
                jnp.sum(p, axis=1, keepdims=True), l_prev.shape
            )
            m_scr[...] = m_next

            v = _upk(kv[:, page_size:, :].reshape(ck, kv.shape[-1]), kv_e4m3)
            o_curr = jax.lax.dot(
                p.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32
            )
            acc_scr[...] = acc_scr[...] * alpha[:, :1] + o_curr
            return ()

        jax.lax.fori_loop(0, t_max, body, (), unroll=False)

        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[r] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        return ()

    jax.lax.fori_loop(0, r_pack, r_body, (), unroll=False)


@functools.partial(
    jax.jit,
    static_argnames=("sq", "pages_per_compute_block", "r_pack", "interpret"),
)
def _decode_fused_packed_pallas(
    q4,  # [B, Hkv, SGP, D] bf16
    kv_pages,  # [Hkv, nb, 2*bs, D]
    block_ids,
    kv_lens,
    scale,
    sq: int,
    pages_per_compute_block: int,
    r_pack: int,
    interpret: bool = False,
):
    b, hkv, sgp, d = q4.shape
    kv_pages, kv_e4m3 = _kv_bits(kv_pages)
    bs = kv_pages.shape[2] // 2
    dv = kv_pages.shape[-1]
    max_blocks = block_ids.shape[1]
    pcb = pages_per_compute_block
    total_flat = b * hkv
    assert total_flat % r_pack == 0

    q_flat = q4.reshape(total_flat, sgp, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(total_flat // r_pack,),
        in_specs=[
            pl.BlockSpec((r_pack, sgp, d), lambda p, *_: (p, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((r_pack, sgp, dv), lambda p, *_: (p, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, pcb, 2 * bs, d), kv_pages.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((sgp, _LANES), jnp.float32),
            pltpu.VMEM((sgp, _LANES), jnp.float32),
            pltpu.VMEM((sgp, dv), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _decode_fused_packed_kernel,
        sq=sq,
        r_pack=r_pack,
        pcb=pcb,
        page_size=bs,
        max_blocks=max_blocks,
        batch=b,
        num_kv_heads=hkv,
        kv_e4m3=kv_e4m3,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((total_flat, sgp, dv), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        kv_lens,
        jnp.pad(block_ids.reshape(-1), (0, pcb)),
        scale,
        q_flat,
        kv_pages,
    )
    return out.reshape(b, hkv, sgp, dv)


def _decode_qt0_kernel(
    # scalar prefetch
    kv_lens_ref,
    block_tbl_ref,
    scale_ref,  # [1] f32 (sm_scale; k scales are per-token here)
    # inputs
    q_ref,  # [1, 1, SGP, D] bf16 (per-token-per-head q scale folded outside)
    k_pages_ref,  # [Hkv, nb, bs, D] fp8 ANY
    v_pages_ref,
    ks_ref,  # [1, 1, num_t, ck] f32 VMEM block — dense per-token K scales
    # outputs
    o_ref,
    # scratch
    k_buf,
    v_buf,
    sems,
    m_scr,
    l_scr,
    acc_scr,
    buf_idx_ref,
    *,
    sq: int,
    pcb: int,
    page_size: int,
    max_blocks: int,
    batch: int,
    num_kv_heads: int,
    num_t: int,
    kv_e4m3: bool = False,
):
    """QuantType-0 decode (reference scheme (b), hpc/attention.py:8-12):
    fp8 K with one scale per (token, kv-head). The scale is applied to the
    LOGITS after the QK matmul (s[:, j] *= ks[j] — exact, since the scale is
    constant along D), so the kernel needs no K dequant pass; scales arrive
    as a dense per-(batch, head) row gathered through the page table outside
    (4 bytes/token vs 128 for K — ~3% extra traffic). V's per-head scale
    folds into the output outside."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    ck = pcb * page_size

    kv_len = kv_lens_ref[b]
    t_max = jnp.maximum((kv_len + ck - 1) // ck, 1)

    def start_copy(bi, hi, ti, slot):
        args = dict(
            block_tbl_ref=block_tbl_ref, head=hi,
            page_start=bi * max_blocks + ti * pcb, num_pages=pcb, slot=slot,
            num_valid=jnp.clip(
                (kv_lens_ref[bi] + page_size - 1) // page_size - ti * pcb,
                1, pcb,
            ),
        )
        kc = MultiPageCopy(k_pages_ref, k_buf, sems.at[slot, 0], **args)
        vc = MultiPageCopy(v_pages_ref, v_buf, sems.at[slot, 1], **args)
        return kc, vc

    @pl.when((b == 0) & (h == 0))
    def _():
        k_buf[...] = jnp.zeros_like(k_buf)
        v_buf[...] = jnp.zeros_like(v_buf)
        buf_idx_ref[0] = 0
        kc, vc = start_copy(b, h, 0, 0)
        kc.start()
        vc.start()

    m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    q = (q_ref[0, 0].astype(jnp.float32) * scale_ref[0]).astype(jnp.bfloat16)
    sgp = q.shape[0]

    nb_ = jnp.where(h == num_kv_heads - 1, b + 1, b)
    nh = jnp.where(h == num_kv_heads - 1, 0, h + 1)

    def body(t, _):
        slot = buf_idx_ref[0]
        next_slot = 1 - slot
        is_last_t = t == t_max - 1
        pb = jnp.where(is_last_t, nb_, b)
        ph = jnp.where(is_last_t, nh, h)
        pt = jnp.where(is_last_t, 0, t + 1)

        @pl.when(pb < batch)
        def _():
            kc, vc = start_copy(pb, ph, pt, next_slot)
            kc.start()
            vc.start()

        buf_idx_ref[0] = next_slot

        kc, vc = start_copy(b, h, t, slot)
        kc.wait()
        k = _upk(k_buf[slot].reshape(ck, k_buf.shape[-1]), kv_e4m3)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * ks_ref[0, 0, t][None, :]

        kpos = t * ck + jax.lax.broadcasted_iota(jnp.int32, (sgp, ck), 1)
        if sq == 1:
            s = jnp.where(kpos < kv_len, s, MASK_VALUE)
        else:
            row = jax.lax.broadcasted_iota(jnp.int32, (sgp, ck), 0)
            qpos = kv_len - sq + row % sq
            s = jnp.where(kpos <= qpos, s, MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.broadcast_to(jnp.max(s, axis=1, keepdims=True), m_prev.shape)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_scr[...] = alpha * l_prev + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape
        )
        m_scr[...] = m_next

        vc.wait()
        v = _upk(v_buf[slot].reshape(ck, v_buf.shape[-1]), kv_e4m3)
        o_curr = jax.lax.dot(
            p.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + o_curr
        return ()

    if num_t == 1:
        body(0, ())
    else:
        jax.lax.fori_loop(0, t_max, body, (), unroll=False)

    l = l_scr[:, :1]
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sq", "pages_per_compute_block", "interpret")
)
def _decode_qt0_pallas(
    q4,  # [B, Hkv, SGP, D] bf16
    k_pages,  # [Hkv, nb, bs, D] fp8
    v_pages,
    ks_dense,  # [B, Hkv, num_t, ck] f32 — page-table-gathered K scales
    block_ids,
    kv_lens,
    scale,
    sq: int,
    pages_per_compute_block: int,
    interpret: bool = False,
):
    b, hkv, sgp, d = q4.shape
    k_pages, kv_e4m3 = _kv_bits(k_pages)
    v_pages, _ = _kv_bits(v_pages)
    _, nb, bs, _ = k_pages.shape
    dv = v_pages.shape[-1]
    max_blocks = block_ids.shape[1]
    pcb = pages_per_compute_block
    num_t = ks_dense.shape[2]
    ck = ks_dense.shape[3]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, sgp, d), lambda bi, hi, *_: (bi, hi, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, 1, num_t, ck), lambda bi, hi, *_: (bi, hi, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, sgp, dv), lambda bi, hi, *_: (bi, hi, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, pcb, bs, d), k_pages.dtype),
            pltpu.VMEM((2, pcb, bs, dv), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((sgp, _LANES), jnp.float32),
            pltpu.VMEM((sgp, _LANES), jnp.float32),
            pltpu.VMEM((sgp, dv), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _decode_qt0_kernel,
        sq=sq,
        pcb=pcb,
        page_size=bs,
        max_blocks=max_blocks,
        batch=b,
        num_kv_heads=hkv,
        num_t=num_t,
        kv_e4m3=kv_e4m3,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, sgp, dv), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        kv_lens,
        jnp.pad(block_ids.reshape(-1), (0, pcb)),
        scale,
        q4,
        k_pages,
        v_pages,
        ks_dense,
    )


def _decode_tasks_kernel(
    # scalar prefetch
    kv_lens_ref,  # [B]
    block_tbl_ref,  # [B * max_blocks]
    scale_ref,  # [1] f32
    t_batch_ref,  # [T]
    t_head_ref,  # [T]
    t_tile_start_ref,  # [T]
    t_num_tiles_ref,  # [T]
    # inputs
    q_ref,  # [1, 1, SGP, D] (block for this task's (b, h))
    k_pages_ref,
    v_pages_ref,
    # outputs (per task)
    o_ref,  # [1, SGP, D] f32 UNNORMALIZED
    m_ref,  # [1, SGP, LANES] f32
    l_ref,  # [1, SGP, LANES] f32
    # scratch
    k_buf,
    v_buf,
    sems,
    m_scr,
    l_scr,
    acc_scr,
    *,
    sq: int,
    pcb: int,
    page_size: int,
    max_blocks: int,
    kv_e4m3: bool = False,
):
    t = pl.program_id(0)
    ck = pcb * page_size
    b = t_batch_ref[t]
    h = t_head_ref[t]
    tile0 = t_tile_start_ref[t]
    ntiles = t_num_tiles_ref[t]
    active = b >= 0

    # inactive tasks emit neutral partials so the segment-combine ignores them
    @pl.when(jnp.logical_not(active))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(active)
    def _():
        kv_len = kv_lens_ref[jnp.maximum(b, 0)]

        def start_copy(j, slot):
            page_start = b * max_blocks + (tile0 + j) * pcb
            need = jnp.clip(
                (kv_len + page_size - 1) // page_size - (tile0 + j) * pcb,
                1, pcb,
            )
            kc = MultiPageCopy(
                k_pages_ref, k_buf, sems.at[slot, 0], block_tbl_ref,
                head=h, page_start=page_start, num_pages=pcb, slot=slot,
                num_valid=need,
            )
            vc = MultiPageCopy(
                v_pages_ref, v_buf, sems.at[slot, 1], block_tbl_ref,
                head=h, page_start=page_start, num_pages=pcb, slot=slot,
                num_valid=need,
            )
            return kc, vc

        @pl.when(t == 0)
        def _():
            k_buf[...] = jnp.zeros_like(k_buf)
            v_buf[...] = jnp.zeros_like(v_buf)

        kc0, vc0 = start_copy(0, 0)
        kc0.start()
        vc0.start()

        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

        def body(j, _):
            slot = j % 2

            @pl.when(j + 1 < ntiles)
            def _():
                kc, vc = start_copy(j + 1, (j + 1) % 2)
                kc.start()
                vc.start()

            kc, vc = start_copy(j, slot)
            kc.wait()
            k = _upk(k_buf[slot].reshape(ck, k_buf.shape[-1]), kv_e4m3)
            q = (q_ref[0, 0].astype(jnp.float32) * scale_ref[0]).astype(
                jnp.bfloat16
            )
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            sgp = q.shape[0]
            kpos = (tile0 + j) * ck + jax.lax.broadcasted_iota(
                jnp.int32, (sgp, ck), 1
            )
            if sq == 1:
                s = jnp.where(kpos < kv_len, s, MASK_VALUE)
            else:
                row = jax.lax.broadcasted_iota(jnp.int32, (sgp, ck), 0)
                qpos = kv_len - sq + row % sq
                s = jnp.where(kpos <= qpos, s, MASK_VALUE)

            m_prev = m_scr[...]
            l_prev = l_scr[...]
            m_curr = jnp.broadcast_to(
                jnp.max(s, axis=1, keepdims=True), m_prev.shape
            )
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])
            l_scr[...] = alpha * l_prev + jnp.broadcast_to(
                jnp.sum(p, axis=1, keepdims=True), l_prev.shape
            )
            m_scr[...] = m_next
            vc.wait()
            v = _upk(v_buf[slot].reshape(ck, v_buf.shape[-1]), kv_e4m3)
            o_curr = jax.lax.dot(
                p.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32
            )
            acc_scr[...] = acc_scr[...] * alpha[:, :1] + o_curr
            return ()

        jax.lax.fori_loop(0, ntiles, body, ())
        o_ref[0] = acc_scr[...]
        m_ref[0] = m_scr[...]
        l_ref[0] = l_scr[...]


@functools.partial(
    jax.jit, static_argnames=("sq", "pages_per_compute_block", "interpret")
)
def _decode_tasks_pallas(
    q4,  # [B, Hkv, SGP, D]
    k_pages,
    v_pages,
    block_ids,
    kv_lens,
    scale,
    t_batch,
    t_head,
    t_tile_start,
    t_num_tiles,
    sq: int,
    pages_per_compute_block: int,
    interpret: bool = False,
):
    b, hkv, sgp, d = q4.shape
    k_pages, kv_e4m3 = _kv_bits(k_pages)
    v_pages, _ = _kv_bits(v_pages)
    _, nb, bs, _ = k_pages.shape
    dv = v_pages.shape[-1]
    max_blocks = block_ids.shape[1]
    pcb = pages_per_compute_block
    cap = t_batch.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(cap,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, sgp, d),
                lambda t, kvl, tbl, sc, tb, th, ts, tn: (
                    jnp.maximum(tb[t], 0),
                    th[t],
                    0,
                    0,
                ),
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, sgp, dv), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, sgp, _LANES), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, sgp, _LANES), lambda t, *_: (t, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, pcb, bs, d), k_pages.dtype),
            pltpu.VMEM((2, pcb, bs, dv), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((sgp, _LANES), jnp.float32),
            pltpu.VMEM((sgp, _LANES), jnp.float32),
            pltpu.VMEM((sgp, dv), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _decode_tasks_kernel,
        sq=sq,
        pcb=pcb,
        page_size=bs,
        max_blocks=max_blocks,
        kv_e4m3=kv_e4m3,
    )
    o, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((cap, sgp, dv), jnp.float32),
            jax.ShapeDtypeStruct((cap, sgp, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((cap, sgp, _LANES), jnp.float32),
        ),
        interpret=interpret,
    )(
        kv_lens,
        # a request's last work tile may extend past its page-table row
        # (tile span > kv_len): pad so kernel page lookups stay in bounds;
        # the extra pages read valid data that the kv_len mask discards
        jnp.pad(block_ids.reshape(-1), (0, pcb)),
        scale,
        t_batch,
        t_head,
        t_tile_start,
        t_num_tiles,
        q4,
        k_pages,
        v_pages,
    )
    return o, m[:, :, 0], l[:, :, 0]


def _segment_combine(o, m, l, seg, num_segs):
    """Merge per-task partials by (batch, head) segment with LSE rescaling."""
    m_g = jax.ops.segment_max(m, seg, num_segments=num_segs)  # [S, SGP]
    m_safe = jnp.where(jnp.isfinite(m_g), m_g, 0.0)
    alpha = jnp.exp(jnp.minimum(m - m_safe[seg], 0.0))
    alpha = jnp.where(jnp.isfinite(m), alpha, 0.0)
    l_g = jax.ops.segment_sum(l * alpha, seg, num_segments=num_segs)
    o_g = jax.ops.segment_sum(o * alpha[:, :, None], seg, num_segments=num_segs)
    l_inv = jnp.where(l_g == 0.0, 1.0, 1.0 / l_g)
    return o_g * l_inv[:, :, None]  # [S, SGP, D]


@functools.partial(
    jax.jit,
    static_argnames=("sq", "pages_per_compute_block", "interpret", "nhd"),
)
def _decode_pallas(
    q4,  # [B, Hkv, SGP, D] bf16
    k_pages,  # [Hkv, nb, bs, D] — or flat NHD [nb, bs, Hkv*D] with nhd=True
    v_pages,
    block_ids,  # [B, max_blocks] int32
    kv_lens,  # [B] int32
    scale,  # [1] f32 — sm_scale (x per-tensor kscale), applied in-kernel
    sq: int,
    pages_per_compute_block: int,
    interpret: bool = False,
    nhd: bool = False,
):
    b, hkv, sgp, d = q4.shape
    k_pages, kv_e4m3 = _kv_bits(k_pages)
    v_pages, _ = _kv_bits(v_pages)
    if nhd:
        nb, bs = k_pages.shape[0], k_pages.shape[1]
        dv = v_pages.shape[-1] // hkv
    else:
        _, nb, bs, _ = k_pages.shape
        dv = v_pages.shape[-1]
    max_blocks = block_ids.shape[1]
    pcb = pages_per_compute_block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec(
                (1, 1, sgp, d), lambda bi, hi, *_: (bi, hi, 0, 0)
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, sgp, dv), lambda bi, hi, *_: (bi, hi, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, pcb, bs, d), k_pages.dtype),
            pltpu.VMEM((2, pcb, bs, dv), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((sgp, _LANES), jnp.float32),
            pltpu.VMEM((sgp, _LANES), jnp.float32),
            pltpu.VMEM((sgp, dv), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel,
        sq=sq,
        pcb=pcb,
        page_size=bs,
        max_blocks=max_blocks,
        batch=b,
        num_kv_heads=hkv,
        num_t=cdiv(max_blocks, pcb),
        nhd=nhd,
        kv_e4m3=kv_e4m3,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, sgp, dv), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_lens, jnp.pad(block_ids.reshape(-1), (0, pcb)), scale, q4, k_pages, v_pages)
    return out


def unpack_tailrow_kscale(kcache_with_tail: jax.Array):
    """Split a reference tail-row-scale page array into (data, scales).

    Reference serving layout (hpc/attention.py:458-462 and
    tests/test_attention_decode_qkpertoken_perhead_vperhead_fp8.py:14-37):
    each NHD page carries ``block_size + block_size*4/D`` rows; the tail
    rows are the page's per-(token, head) f32 K scales stored as raw bytes
    (f32 [nb, H, bs] -> bytes -> [nb, scale_rows, H, D] rows appended to
    the page).

    Returns (kcache [nb, bs, H, D] same dtype, kscale [nb, bs, H, 1] f32).
    """
    nb, rows, h, d = kcache_with_tail.shape
    bs = rows * d // (d + 4)
    assert bs + bs * 4 // d == rows, (
        f"rows={rows} is not block_size + block_size*4/{d}"
    )
    # Upload tail-layout pools as int8 (byte view): the host->device
    # transfer of fp8-TYPED arrays canonicalizes e4m3 NaN patterns
    # (measured: byte 0xff -> 0x7f), and the tail rows are raw f32 scale
    # bytes — any canonicalization corrupts them. int8 transfers are
    # bit-exact; fp8-typed input is still accepted for pools that already
    # live on device.
    if kcache_with_tail.dtype == jnp.int8:
        bits = kcache_with_tail
        kcache_with_tail = jax.lax.bitcast_convert_type(
            bits, jnp.float8_e4m3fn
        )
    else:
        bits = jax.lax.bitcast_convert_type(kcache_with_tail, jnp.int8)
    data = jax.lax.bitcast_convert_type(
        bits[:, :bs], kcache_with_tail.dtype
    )
    tail_b = bits[:, bs:]  # [nb, sr, H, D] scale bytes
    # [nb, sr, H, D] -> [nb, H, sr, D] -> [nb, H, bs, 4] bytes -> f32
    tail_b = jnp.transpose(tail_b, (0, 2, 1, 3)).reshape(nb, h, bs, 4)
    scales = jax.lax.bitcast_convert_type(tail_b, jnp.float32)  # [nb, H, bs]
    return data, jnp.transpose(scales, (0, 2, 1))[..., None]


def _pack_q(q, b, sq, hkv, g, d, sgp):
    """[B*Sq, Hq, D] -> [B, Hkv, SGP, D] with row index = g*sq + s."""
    q4 = q.reshape(b, sq, hkv, g, d)  # heads split as (hkv, g): Hq = hkv*g
    q4 = jnp.transpose(q4, (0, 2, 3, 1, 4)).reshape(b, hkv, g * sq, d)
    if sgp > g * sq:
        q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, sgp - g * sq), (0, 0)))
    return q4


def _unpack_o(o4, b, sq, hkv, g, dv):
    """[B, Hkv, SGP, Dv] -> [B*Sq, Hq, Dv]."""
    o4 = o4[:, :, : g * sq].reshape(b, hkv, g, sq, dv)
    return jnp.transpose(o4, (0, 3, 1, 2, 4)).reshape(b * sq, hkv * g, dv)


def attention_decode(
    q,
    kcache,
    vcache,
    block_ids,
    num_seq_kvcache,
    mtp: int = 0,
    new_kv_included: bool = False,
    qscale=None,
    kscale=None,
    vscale=None,
    quant_type: QuantType = QuantType.QPERTOKEN_PERHEAD_KPERTENSOR_VPERTENSOR,
    splitk: bool = True,
    task_map=None,
    *,
    sm_scale: float | None = None,
    pages_per_compute_block: int | None = None,
    task_tile: int = 512,
    cache_layout: str = "NHD",
    impl: str = "auto",
):
    """Paged GQA decode attention; BF16 or FP8 cache.

    Args mirror hpc/attention.py:341-517. ``q`` is [B*Sq, Hq, D] with
    Sq = mtp+1 (bf16, or fp8 with qscale [B*Sq, Hq]); caches are
    [num_blocks, block_size, Hkv, D] (NHD, default) or
    [Hkv, num_blocks, block_size, D] (``cache_layout="HND"``, the native fast
    layout). Returns [B*Sq, Hq, Dv] bf16.

    ``task_map``: optional :class:`~hpc_ops_tpu.ops.attention.scheduler.TaskMap`
    from ``assign_attention_decode_task`` (scheduled with ``tile=task_tile``
    tokens per work tile) — runs the task-scheduled kernel whose grid covers
    exactly the existing work (the reference's dynamic split-k mode) and
    merges split partials with a segment-combine epilogue.
    """
    del splitk  # static split-k: the pipelined grid plays that role on TPU
    sq = mtp + 1
    b = num_seq_kvcache.shape[0]
    hq, d = q.shape[1], q.shape[2]
    if cache_layout == "NHD":
        hkv = kcache.shape[2]
    elif cache_layout == "NHD_FUSED":  # [nb, 2*bs, Hkv*D], vcache unused
        hkv = kcache.shape[2] // d
    else:  # "HND" or "FUSED" ([Hkv, nb, 2*bs, D], vcache unused)
        hkv = kcache.shape[0]
    g = hq // hkv
    kv_lens = num_seq_kvcache.astype(jnp.int32) + (0 if new_kv_included else sq)

    is_fp8 = kcache.dtype != jnp.bfloat16
    pertoken_k = is_fp8 and QuantType(quant_type) in (
        QuantType.QPERTOKEN_PERHEAD_KPERTOKEN_PERHEAD_VPERHEAD,
        QuantType.QPERTOKEN_PERHEAD_KPERTOKEN_PERHEAD_VPERHEAD_QKHADAMARD,
    )

    if (
        pertoken_k
        and kscale is not None
        and getattr(kscale, "ndim", 0) == 4
        and kscale.dtype == kcache.dtype
    ):
        # reference serving layout: per-token K scales live in the tail
        # rows of the cache pages themselves (kscale is the tail view or
        # the whole page array) — consume the pages 1:1
        assert cache_layout == "NHD", "tail-row scales are an NHD contract"
        kcache, kscale = unpack_tailrow_kscale(kcache)
        if vcache.dtype == jnp.int8:  # byte-view upload (see unpack docs)
            vcache = jax.lax.bitcast_convert_type(vcache, jnp.float8_e4m3fn)
        if vcache.shape[1] != kcache.shape[1]:
            vcache = vcache[:, : kcache.shape[1]]

    qt0_fast = (
        pertoken_k
        and task_map is None
        and kscale is not None
        and kscale.shape[-1] == 1
    )
    if impl == "ref" or (pertoken_k and not qt0_fast):
        # QuantType-0 runs the Pallas path only for the reference's actual
        # scheme (one scale per token-head, no task map); grouped-D scales
        # and the task-map mode use the XLA gather path.
        if cache_layout == "FUSED":
            from hpc_ops_tpu.ops.attention.paging import unpack_kv_fused

            kcache, vcache = unpack_kv_fused(kcache)
            cache_layout = "HND"
        elif cache_layout == "NHD_FUSED":
            from hpc_ops_tpu.ops.attention.paging import unpack_kv_fused_nhd

            kcache, vcache = unpack_kv_fused_nhd(kcache, hkv)
            cache_layout = "HND"
        if cache_layout == "HND":
            kcache_n = jnp.transpose(kcache, (1, 2, 0, 3))
            vcache_n = jnp.transpose(vcache, (1, 2, 0, 3))
        else:
            kcache_n, vcache_n = kcache, vcache
        return attention_decode_ref(
            q,
            kcache_n,
            vcache_n,
            block_ids,
            num_seq_kvcache,
            mtp,
            new_kv_included,
            qscale=qscale,
            kscale=kscale,
            vscale=vscale,
            quant_type=quant_type,
        )

    # per-tensor scales fold into a single in-kernel logit scale; only the
    # per-token-per-head qscale (fp8) needs a pass over q itself
    scale = (1.0 / (d**0.5)) if sm_scale is None else sm_scale
    if is_fp8 and kscale is not None and not pertoken_k:
        scale_arr = (kscale.reshape(()).astype(jnp.float32) * scale).reshape(1)
    else:
        scale_arr = jnp.full((1,), scale, jnp.float32)
    if qscale is not None:
        qf = (
            q.astype(jnp.float32)
            * qscale.reshape(b * sq, hq)[..., None].astype(jnp.float32)
        ).astype(jnp.bfloat16)
    else:
        qf = q.astype(jnp.bfloat16)

    sgp = max(round_up(g * sq, 8), 8)
    q4 = _pack_q(qf, b, sq, hkv, g, d, sgp)

    if cache_layout == "NHD_FUSED":
        kv_pages = kcache  # [nb, 2*bs, Hkv*D]
        page_size = kv_pages.shape[1] // 2
        dv = d
        if task_map is None:
            if pages_per_compute_block is None:
                # slab = 2*bs x Hkv*D for ALL heads; size the double buffer
                # to ~4MB of VMEM
                slab = kv_pages.shape[1] * kv_pages.shape[2] * (
                    1 if kv_pages.dtype == jnp.int8 else 2
                )
                pages_per_compute_block = max(
                    1, min(block_ids.shape[1], (4 << 20) // (2 * slab))
                )
            o4 = _decode_nhd_fused_pallas(
                q4,
                kv_pages,
                jnp.maximum(block_ids.astype(jnp.int32), 0),
                kv_lens,
                scale_arr,
                sq,
                hkv,
                pages_per_compute_block,
                interpret=interpret_default(),
            )
            out = _unpack_o(o4, b, sq, hkv, g, dv)
            if is_fp8 and vscale is not None:
                out = out * vscale.reshape(()).astype(jnp.float32)
            return out.astype(jnp.bfloat16)
        # task-map mode reads split per-head pages; unpack (one repack)
        from hpc_ops_tpu.ops.attention.paging import unpack_kv_fused_nhd

        kcache, vcache = unpack_kv_fused_nhd(kcache, hkv)
        cache_layout = "HND"

    fused = cache_layout == "FUSED"
    if fused:
        kv_pages = kcache  # [Hkv, nb, 2*bs, D]
        page_size = kv_pages.shape[2] // 2
        dv = kv_pages.shape[-1]
        if task_map is None:
            if pages_per_compute_block is None:
                pages_per_compute_block = max(
                    1, min(4096 // page_size, block_ids.shape[1])
                )
            # short-KV regime: grid-step overhead dominates at <= ~1K KV
            # tokens per (b, h) — pack several pairs per grid step
            # (HPC_DECODE_RPACK env overrides the candidate for tuning
            # sweeps; divisibility still enforced)
            r_pack = 1
            if block_ids.shape[1] * page_size <= 1024:
                import os as _os

                cands: tuple = (8, 4, 2)
                env = _os.environ.get("HPC_DECODE_RPACK")
                if env:
                    cands = (int(env),) + cands
                for cand in cands:
                    if cand > 1 and (b * hkv) % cand == 0:
                        r_pack = cand
                        break
            if r_pack > 1:
                o4 = _decode_fused_packed_pallas(
                    q4,
                    kv_pages,
                    jnp.maximum(block_ids.astype(jnp.int32), 0),
                    kv_lens,
                    scale_arr,
                    sq,
                    pages_per_compute_block,
                    r_pack,
                    interpret=interpret_default(),
                )
            else:
                o4 = _decode_fused_pallas(
                    q4,
                    kv_pages,
                    jnp.maximum(block_ids.astype(jnp.int32), 0),
                    kv_lens,
                    scale_arr,
                    sq,
                    pages_per_compute_block,
                    interpret=interpret_default(),
                )
            out = _unpack_o(o4, b, sq, hkv, g, dv)
            if is_fp8 and vscale is not None:
                out = out * vscale.reshape(()).astype(jnp.float32)
            return out.astype(jnp.bfloat16)
        # task-map mode reads split pages; unpack (one slice copy)
        from hpc_ops_tpu.ops.attention.paging import unpack_kv_fused

        k_pages, v_pages = unpack_kv_fused(kv_pages)
    elif cache_layout == "NHD":
        if (
            task_map is None
            and not pertoken_k
            and d % 128 == 0
            and vcache.shape[-1] % 128 == 0
        ):
            # stride-native NHD: the kernel DMAs per-(page, head) lane
            # slices of the flat [nb, bs, H*D] view — O(touched pages), no
            # cache transpose (the reference reads NHD via strides the same
            # way, hpc/attention.py:93-105)
            nb_, bs_ = kcache.shape[0], kcache.shape[1]
            if pages_per_compute_block is None:
                pages_per_compute_block = max(
                    1, min(4096 // bs_, block_ids.shape[1])
                )
            o4 = _decode_pallas(
                q4,
                kcache.reshape(nb_, bs_, hkv * d),
                vcache.reshape(nb_, bs_, hkv * vcache.shape[-1]),
                jnp.maximum(block_ids.astype(jnp.int32), 0),
                kv_lens,
                scale_arr,
                sq,
                pages_per_compute_block,
                interpret=interpret_default(),
                nhd=True,
            )
            out = _unpack_o(o4, b, sq, hkv, g, vcache.shape[-1])
            if is_fp8 and vscale is not None:
                out = out * vscale.reshape(()).astype(jnp.float32)
            return out.astype(jnp.bfloat16)
        k_pages = nhd_to_hnd(kcache)
        v_pages = nhd_to_hnd(vcache)
    else:
        k_pages, v_pages = kcache, vcache

    page_size = k_pages.shape[2]
    dv = v_pages.shape[-1]
    if task_map is not None:
        tile = getattr(task_map, "tile", task_tile)
        assert tile % page_size == 0, "task tile must be page-aligned"
        pcb = tile // page_size
        o_p, m_p, l_p = _decode_tasks_pallas(
            q4,
            k_pages,
            v_pages,
            jnp.maximum(block_ids.astype(jnp.int32), 0),
            kv_lens,
            scale_arr,
            task_map.batch,
            task_map.head,
            task_map.tile_start,
            task_map.num_tiles,
            sq,
            pcb,
            interpret=interpret_default(),
        )
        o_seg = _segment_combine(o_p, m_p, l_p, task_map.seg, task_map.num_segs)
        o4 = o_seg.reshape(b, hkv, sgp, dv)
    elif pertoken_k:
        if pages_per_compute_block is None:
            pages_per_compute_block = max(
                1, min(4096 // page_size, block_ids.shape[1])
            )
        pcb = pages_per_compute_block
        max_blocks = block_ids.shape[1]
        num_t = cdiv(max_blocks, pcb)
        ck = pcb * page_size
        # kscale arrives paged [nb, bs, Hkv, 1]; gather it dense through the
        # page table (4 bytes/token — ~3% of the fp8 K traffic) so the
        # kernel can scale logits per kv column
        ks = kscale.astype(jnp.float32).reshape(
            kscale.shape[0], page_size, hkv
        )  # [nb, bs, Hkv]
        tbl = jnp.maximum(block_ids.astype(jnp.int32), 0)  # [B, max_blocks]
        ks_gather = ks[tbl]  # [B, max_blocks, bs, Hkv]
        ks_dense = jnp.transpose(ks_gather, (0, 3, 1, 2)).reshape(
            b, hkv, max_blocks * page_size
        )
        pad = num_t * ck - max_blocks * page_size
        if pad:
            ks_dense = jnp.pad(ks_dense, ((0, 0), (0, 0), (0, pad)))
        ks_dense = ks_dense.reshape(b, hkv, num_t, ck)
        o4 = _decode_qt0_pallas(
            q4,
            k_pages,
            v_pages,
            ks_dense,
            tbl,
            kv_lens,
            scale_arr,
            sq,
            pcb,
            interpret=interpret_default(),
        )
        if vscale is not None:
            # per-head V scale folds into the per-(kv-head) output block
            o4 = (
                o4.astype(jnp.float32)
                * vscale.reshape(1, hkv, 1, 1).astype(jnp.float32)
            ).astype(jnp.bfloat16)
    else:
        if pages_per_compute_block is None:
            # Large chunks amortize DMA issue + grid overhead; measured on
            # v5e: 512-token chunks reach ~55% of the bandwidth of
            # 4096-token chunks on the uniform_4096 scenario. VMEM cost is
            # 2 slots * 2 (K,V) * chunk_tokens * D * dtype_size (~4MB bf16).
            pages_per_compute_block = max(
                1, min(4096 // page_size, block_ids.shape[1])
            )
        o4 = _decode_pallas(
            q4,
            k_pages,
            v_pages,
            jnp.maximum(block_ids.astype(jnp.int32), 0),
            kv_lens,
            scale_arr,
            sq,
            pages_per_compute_block,
            interpret=interpret_default(),
        )
    out = _unpack_o(o4, b, sq, hkv, g, dv)
    if is_fp8 and vscale is not None and not pertoken_k:
        out = out * vscale.reshape(()).astype(jnp.float32)
    return out.astype(jnp.bfloat16)


def attention_decode_bf16(
    q,
    kcache,
    vcache,
    block_ids,
    num_seq_kvcache,
    mtp: int = 0,
    new_kv_included: bool = False,
    splitk: bool = True,
    task_map=None,
    **kw,
):
    """BF16 decode (reference op #5). See :func:`attention_decode`."""
    return attention_decode(
        q,
        kcache,
        vcache,
        block_ids,
        num_seq_kvcache,
        mtp,
        new_kv_included,
        splitk=splitk,
        task_map=task_map,
        **kw,
    )


def attention_decode_fp8(
    q,
    kcache,
    vcache,
    block_ids,
    num_seq_kvcache,
    qscale,
    kscale,
    vscale,
    mtp: int = 0,
    new_kv_included: bool = False,
    quant_type: QuantType = QuantType.QPERTOKEN_PERHEAD_KPERTENSOR_VPERTENSOR,
    splitk: bool = True,
    task_map=None,
    **kw,
):
    """FP8 decode (reference op #6). See :func:`attention_decode`."""
    return attention_decode(
        q,
        kcache,
        vcache,
        block_ids,
        num_seq_kvcache,
        mtp,
        new_kv_included,
        qscale=qscale,
        kscale=kscale,
        vscale=vscale,
        quant_type=quant_type,
        splitk=splitk,
        task_map=task_map,
        **kw,
    )


__all__ = [
    "attention_decode",
    "attention_decode_bf16",
    "attention_decode_fp8",
    "unpack_tailrow_kscale",
]
