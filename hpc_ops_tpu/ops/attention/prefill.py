"""Varlen prefill attention over a paged KV cache (BF16 / FP8 / block-sparse).

Reference parity: hpc/attention.py ops #1-#4 (attention_prefill_bf16,
attention_with_kvcache_prefill_bf16/fp8, blocksparse fp8). One unified Pallas
kernel family — the reference's ``kHasMask`` template flag becomes the
``sparse`` variant here, which walks a compacted per-(batch, q-head, q-tile)
list of active KV tiles so masked-out tiles are neither DMA'd nor computed
(the source of the reference's 3.16x sparse speedup, README.md:173).

TPU design:
  * grid = (num_batch, num_kv_heads, num_q_tiles); each program loads one
    q tile for the whole GQA group (G q-heads), then streams KV pages through
    a double-buffered VMEM slab — KV is read once per q tile for ALL G heads
    (the CUDA kernel re-reads per q-head warpgroup).
  * Varlen: q is packed [total_q, Hq, D]; per-request offsets come from
    scalar-prefetched cu_seqlens, and q/output tiles are moved with manual
    dynamic-offset DMAs (the TPU analog of the reference's on-device TMA
    descriptor updates, src/utils/tma.cuh:10-59).
  * All per-tensor scales are folded outside (q <- q*qscale*kscale/sqrt(D),
    out <- out*vscale), so BF16/FP8 differ only in the page dtype upcast.
  * QuantType-0 (per-token-per-head K scales, per-head V scales) applies K
    scales to the logits in-kernel (exact: the scale is constant along D)
    from a dense page-table-gathered row, and folds V's per-head scale into
    the output — the same scheme as the decode kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpc_ops_tpu.config import QuantType
from hpc_ops_tpu.ops.attention.decode import _kv_bits, _upk
from hpc_ops_tpu.ops.attention.paging import MultiPageCopy, nhd_to_hnd
from hpc_ops_tpu.ops.attention.reference import (
    MASK_VALUE,
    attention_with_kvcache_prefill_ref,
)
from hpc_ops_tpu.utils.common import cdiv, interpret_default, round_up

_LANES = 128


def _prefill_kernel(
    # scalar prefetch
    cu_ref,  # [B+1] packed row offsets (cu_seqlens_q) — raw, NOT slotted
    kv_lens_ref,  # [B]
    block_tbl_ref,  # [B*max_blocks]
    # inputs
    q_hbm_ref,  # [total_rows(+pad), Hq*D] ANY — the model's NATURAL rows
    k_pages_ref,  # [Hkv, nb, bs, D] ANY
    v_pages_ref,
    ks_ref,  # [1, 1, n_ck, ck] f32 VMEM — per-token K scales (or dummy)
    scale_ref,  # [1, 1] f32 SMEM — softmax scale * log2(e) (or 1.0 if the
    # wrapper pre-scaled rows, e.g. the fp8 per-token-qscale path)
    # outputs
    o_hbm_ref,  # packed_out: [total_rows, Hq*D]; else [B*pitch, Hq*D] slots
    # scratch
    q_bufs,  # [2, SQ, G*D] bf16 — the GQA group lane-packed, double-buffered
    qs_buf,  # [SQ, G*D] bf16 — softmax-scaled q (ref, so subtiles can take
    # dynamic row slices of it)
    k_buf,  # [4, pcb, bs, D] — slots 0/1: chunk stream; 2/3: chunk-0 prefetch
    v_buf,
    acc_buf,  # [SQ, G*D] f32
    m_buf,  # [SQ, G*LANES] f32 (log2 domain)
    l_buf,
    o_stage,  # [SQ, G*D] bf16 staging for output DMA
    q_sems,  # DMA (2,)
    kv_sems,  # DMA (4, 2)
    o_sem,
    *,
    tq: int,
    n_tq: int,
    pcb: int,
    page_size: int,
    max_blocks: int,
    group: int,
    d: int,
    total_rows: int,  # rows of q_hbm (incl. any wrapper pad)
    packed_out: bool,  # write packed rows (needs 8-aligned cu) vs slots
    pitch: int,  # slot pitch (slotted mode)
    pertoken_ks: bool,
    kv_e4m3: bool = False,
):
    """Row-major lane-packed GQA flash prefill over q SUPERBLOCKS, reading
    q DIRECTLY from the model's packed [total_q, Hq*D] rows — no slot
    repack. Window row starts are rounded down to the 8-sublane tile
    (`round8(cu[b] + sb0)`), and every write is position-corrected, so the
    sub-tile misalignment never escapes:

    * packed_out=True (requires all cu[i] % 8 == 0, the serving engine's
      packing contract): outputs land straight in packed rows. Straddler
      subtiles back off to end exactly at q_len (idempotent rewrites of
      rows the previous subtile already wrote); sub-tq requests under the
      end-of-array clamp fall back to 8-row writes. Zero wrapper passes.
    * packed_out=False (arbitrary cu): outputs land in per-request slots
      at `b*pitch + (cu[b]%8) + position` — always 8-aligned because the
      window shift and the slot shift cancel — and ONE wrapper gather
      compacts slots to packed rows.

    Design decisions that carry the MFU (reference bar: its prefill beats
    FA3 on H20, README.md:171):

    * Each program owns SQ = n_tq*tq query rows, not one q tile: every KV
      chunk is DMA'd ONCE per superblock and consumed by all n_tq row
      subtiles that causally need it. At batch-prefill shapes this divides
      both the per-program fixed cost (the round-3 b8_2k killer: ~512
      programs x setup/epilogue for 1.4ms of MXU work) and the KV stream
      bytes by ~n_tq.
    * Chunks fully interior to the WHOLE superblock (the common case once
      kv_off + sb0 > j*ck) run one mask-free sweep over all SQ rows — a
      [SQ, ck] logit dot per head, 4x the MXU op size of per-tile sweeps.
      Boundary chunks fall back to a static per-subtile loop with two
      regimes: mask-free interior, masked straddler.
    * q and o travel in the model's natural [rows, Hq*D] layout: the GQA
      group is ONE [SQ, G*D] lane-packed tile moved by ONE DMA each way.
      Reading the 3D [rows, Hq, D] form directly was measured 2.2x slower
      (exp/prefill3d_iso.py): its per-head sublane extraction and 8-head
      programs both lose to the lane-packed layout the QKV projection
      already emits.
    * The causal mask uses a hoisted ``lane - row`` difference matrix (one
      compare + select against a per-subtile scalar instead of 2 iotas +
      2 compares per masked subtile — this kernel is VPU-tight).
    * Per-GQA-group software pipelining: head g+1's QK^T dot issues before
      head g's softmax, so MXU work overlaps the VPU-bound softmax chain.
    * Cross-PROGRAM prefetch: each program starts the NEXT program's q
      superblock and first KV chunk before its own compute.
    * Softmax runs in the log2 domain: the wrapper folds log2(e) into the
      q pre-scale so the kernel uses exp2 directly.
    """
    b = pl.program_id(0)
    h = pl.program_id(1)  # kv head
    sbi = pl.program_id(2)
    n_hkv = pl.num_programs(1)
    n_sb = pl.num_programs(2)
    total_progs = pl.num_programs(0) * n_hkv * n_sb
    idx = (b * n_hkv + h) * n_sb + sbi
    ck = pcb * page_size
    sq = n_tq * tq

    q_start = cu_ref[b]
    q_len = cu_ref[b + 1] - q_start
    kv_len = kv_lens_ref[b]
    kv_off = kv_len - q_len  # absolute position of q row 0
    sb0 = sbi * sq  # first q row of this superblock (request-relative)

    def row0_of(bb, ss):
        # window read base: packed row, rounded down to the sublane tile;
        # packed mode additionally clamps at the array end (slotted mode
        # pads q instead, so windows never overhang)
        r = cu_ref[bb] + ss * sq
        if packed_out:
            r = jnp.minimum(r, total_rows - sq)
        return pl.multiple_of((r // 8) * 8, 8)

    row0 = row0_of(b, sbi)
    p_base = row0 - q_start  # position of window row 0 (may be < 0)

    # slotted windows start up to 7 rows below cu[b] (round-down), so a
    # request whose last rows fall in the NEXT superblock still needs that
    # superblock computed — gate on the EXACT window position p_base, not
    # sb0 (a +7 slack on sb0 activates a whole garbage superblock for
    # every aligned request: measured 2.2x on b8_2k). Packed mode keeps
    # the sb0 gate: its end-of-array clamp can pull p_base below q_len
    # for tiles that are genuinely past the request.
    tile_active = (sb0 < q_len) if packed_out else (p_base < q_len)

    def q_copies(bb, hh, ss, slot):
        # ONE DMA fetches a superblock's q for all G heads of its kv group
        # (a lane slice at a G*D-aligned offset of the [rows, Hq*D]
        # layout). Reading the natural 3D [rows, Hq, D] layout instead is
        # possible (dim 0 untiled) but measured 2.2x slower — see the
        # docstring.
        lane0 = pl.multiple_of(hh * group * d, group * d)
        return [
            pltpu.make_async_copy(
                q_hbm_ref.at[
                    pl.ds(row0_of(bb, ss), sq), pl.ds(lane0, group * d)
                ],
                q_bufs.at[slot],
                q_sems.at[slot],
            )
        ]

    def start_kv(bb, hh, j, slot):
        # whole chunks are fetched: boundary compute sweeps the full chunk
        # under the causal mask, so every column must hold REAL page data
        # (stale VMEM under a masked column would feed the PV dot
        # 0 * NaN = NaN). The block table is padded/clamped so every
        # fetched page id is valid (bytes wasted <= one partial chunk per
        # superblock), and num_valid=None takes MultiPageCopy's
        # unpredicated fast path.
        nv = None
        kc = MultiPageCopy(
            k_pages_ref,
            k_buf,
            kv_sems.at[slot, 0],
            block_tbl_ref,
            head=hh,
            page_start=bb * max_blocks + j * pcb,
            num_pages=pcb,
            slot=slot,
            num_valid=nv,
        )
        vc = MultiPageCopy(
            v_pages_ref,
            v_buf,
            kv_sems.at[slot, 1],
            block_tbl_ref,
            head=hh,
            page_start=bb * max_blocks + j * pcb,
            num_pages=pcb,
            slot=slot,
            num_valid=nv,
        )
        return kc, vc

    def kv_hi_of(bb, ss):
        # causal kv bound (exclusive) of superblock ss's window (the read
        # base may sit up to 7 rows — or, under the end clamp, further —
        # below cu[bb] + ss*sq; the window's LAST row bounds the kv range)
        kvl = kv_lens_ref[bb]
        off = kvl - (cu_ref[bb + 1] - cu_ref[bb])
        return jnp.minimum(kvl, off + row0_of(bb, ss) - cu_ref[bb] + sq)

    # ---- prefetch program idx+1's q superblock and first KV chunk NOW:
    # its buffers (q slot (idx+1)%2, kv slot 2+(idx+1)%2) were last read by
    # program idx-1, which has fully completed, and the DMAs overlap this
    # whole program's compute.
    @pl.when(idx + 1 < total_progs)
    def _():
        nidx = idx + 1
        nt = nidx % n_sb
        nbh = nidx // n_sb
        nh = nbh % n_hkv
        nb2 = nbh // n_hkv

        # must match tile_active's gate exactly (a prefetch for an inactive
        # tile wastes DMAs; a missing one deadlocks the waits)
        n_qlen = cu_ref[nb2 + 1] - cu_ref[nb2]
        if packed_out:
            n_act = nt * sq < n_qlen
        else:
            n_act = (row0_of(nb2, nt) - cu_ref[nb2]) < n_qlen

        @pl.when(n_act)
        def _():
            for cp in q_copies(nb2, nh, nt, nidx % 2):
                cp.start()
            kc, vc = start_kv(nb2, nh, 0, 2 + nidx % 2)
            kc.start()
            vc.start()

    # the first program has no predecessor to prefetch for it
    @pl.when((idx == 0) & tile_active)
    def _():
        for cp in q_copies(b, h, sbi, 0):
            cp.start()
        kc, vc = start_kv(b, h, 0, 2)
        kc.start()
        vc.start()

    @pl.when(tile_active)
    def _():
        q_slot = idx % 2
        kv0_slot = 2 + q_slot

        # causal upper bound over the whole window (last row)
        kv_hi = kv_hi_of(b, sbi)
        num_kv_tiles = jnp.maximum((kv_hi + ck - 1) // ck, 1)
        diag_lo0 = kv_off + p_base  # first kv position needing any mask

        m_buf[...] = jnp.full_like(m_buf, -jnp.inf)
        l_buf[...] = jnp.zeros_like(l_buf)
        acc_buf[...] = jnp.zeros_like(acc_buf)

        for cp in q_copies(b, h, sbi, q_slot):
            cp.wait()
        # apply the softmax scale here, on the [SQ, G*D] tile in VMEM — a
        # wrapper-side scale pass costs 3 full HBM round trips over q
        qs_buf[...] = (
            q_bufs[q_slot].astype(jnp.float32) * scale_ref[0, 0]
        ).astype(jnp.bfloat16)

        # hoisted mask geometry: dmat[r, c] = c - r is loop-invariant over
        # the WHOLE superblock; a masked chunk then costs ONE compare
        # against a per-chunk scalar + one select per head
        dmat_sq = jax.lax.broadcasted_iota(
            jnp.int32, (sq, ck), 1
        ) - jax.lax.broadcasted_iota(jnp.int32, (sq, ck), 0)

        def g_lanes(g):
            return slice(g * d, (g + 1) * d)

        def gl_lanes(g):
            return slice(g * _LANES, (g + 1) * _LANES)

        def softmax_part(s, g, rows, nrows):
            """Online-softmax state update for head g (log2 domain) on a
            tq-aligned dynamic row slice; returns (p, alpha) for the PV
            stage. p's exp2 runs in bf16 — the PV dot needs bf16 anyway,
            the VPU packs bf16 2/lane, and the 2^-8 rounding matches the
            output dtype."""
            m_prev = m_buf[rows, gl_lanes(g)]
            l_prev = l_buf[rows, gl_lanes(g)]
            m_curr = jnp.broadcast_to(
                jnp.max(s, axis=1, keepdims=True), (nrows, _LANES)
            )
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2((s - m_next[:, :1]).astype(jnp.bfloat16))
            l_buf[rows, gl_lanes(g)] = alpha * l_prev + jnp.broadcast_to(
                jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32),
                (nrows, _LANES),
            )
            m_buf[rows, gl_lanes(g)] = m_next
            return p, alpha

        def pv_part(p, alpha, v, g, rows):
            o_curr = jax.lax.dot(
                p, v, preferred_element_type=jnp.float32
            )
            acc_buf[rows, g_lanes(g)] = (
                acc_buf[rows, g_lanes(g)] * alpha[:, :1] + o_curr
            )

        def group_sweep(qrows, k, v, post, rows, nrows):
            """Per-head QK -> softmax -> PV, software-pipelined two deep:
            head g's PV dot (MXU) is issued AFTER head g+1's QK^T and
            softmax, so at any point the scheduler holds an MXU dot and a
            VPU softmax chain with no data dependence between them."""

            def qk(g):
                return post(
                    jax.lax.dot_general(
                        qrows[:, g_lanes(g)], k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )

            p, a = softmax_part(qk(0), 0, rows, nrows)
            for g in range(group):
                if g + 1 < group:
                    p2, a2 = softmax_part(qk(g + 1), g + 1, rows, nrows)
                pv_part(p, a, v, g, rows)
                if g + 1 < group:
                    p, a = p2, a2

        def body(j, _):
            # chunk 0 lands in the cross-program prefetch slot; later
            # chunks double-buffer through slots 0/1
            slot = jnp.where(j == 0, kv0_slot, j % 2)

            @pl.when(j + 1 < num_kv_tiles)
            def _():
                kc, vc = start_kv(b, h, j + 1, (j + 1) % 2)
                kc.start()
                vc.start()

            kc, vc = start_kv(b, h, j, slot)
            kc.wait()
            vc.wait()

            def interior_all():
                # chunk fully below the FIRST subtile's diagonal and
                # in-range: one mask-free sweep over all SQ rows — the
                # long-context fast path, with [SQ, ck] logit dots
                k = _upk(k_buf[slot].reshape(ck, d), kv_e4m3)
                v = _upk(v_buf[slot].reshape(ck, d), kv_e4m3)
                rows = slice(None)
                qall = qs_buf[...]
                if pertoken_ks:
                    # QuantType-0: one K scale per (token, kv-head) on the
                    # logits (exact — constant along D); linear, so it
                    # commutes with the log2-domain folding
                    ks_row = ks_ref[0, 0, j][None, :]
                    group_sweep(qall, k, v, lambda s: s * ks_row, rows, sq)
                else:
                    group_sweep(qall, k, v, lambda s: s, rows, sq)

            def boundary_all():
                # ONE masked whole-superblock sweep (round 5): at ck == SQ
                # this is MAC-identical to the former per-subtile loop but
                # emits G straight-line dot+softmax chains instead of
                # n_tq*G pl.when blocks — Mosaic cannot overlap MXU/VPU
                # across block boundaries, and at batch-prefill shapes
                # (b8_2k) nearly every chunk straddles the diagonal.
                # qpos = diag_lo0 + r, kpos = j*ck + c, so causality is
                # dmat_sq = c - r <= diag_lo0 - j*ck: one compare against a
                # scalar. The kv_len bound is implied for real rows
                # (qpos < kv_len); window rows outside [0, q_len) attend
                # garbage but their outputs are never read back.
                k = _upk(k_buf[slot].reshape(ck, d), kv_e4m3)
                v = _upk(v_buf[slot].reshape(ck, d), kv_e4m3)
                ks_row = ks_ref[0, 0, j][None, :] if pertoken_ks else None
                thresh = diag_lo0 - j * ck

                def masked_post(s):
                    if pertoken_ks:
                        s = s * ks_row
                    return jnp.where(dmat_sq <= thresh, s, MASK_VALUE)

                def masked_post_rows(s, r0, nrows):
                    if pertoken_ks:
                        s = s * ks_row[:, :s.shape[1]]
                    return jnp.where(
                        dmat_sq[r0:r0 + nrows, :s.shape[1]] <= thresh,
                        s, MASK_VALUE,
                    )

                # Triangle split: when the diagonal enters at (or before)
                # the chunk start (thresh <= 0 — always true for the
                # diagonal chunk of a fresh prefill with ck == SQ), rows of
                # row-band st attend only cols < (st+1)*ck/ns + thresh, so
                # each band sweeps a causally-capped column range —
                # (ns+1)/(2*ns) of the diagonal chunk's MACs (ns=4: 62.5%
                # vs the 100% of one full masked sweep). Bands stay >= 2
                # subtiles tall where possible; the 2-way split alone
                # measured b8_2k 72.5 -> 80.2 TF kernel-only.
                can_split = (thresh <= 0) if ck == sq else None
                if can_split is not None and sq >= 2 * tq:
                    ns = 4 if (sq >= 4 * tq and sq % 4 == 0) else 2
                    hs = sq // ns
                    cs = ck // ns

                    @pl.when(can_split)
                    def _():
                        for st in range(ns):
                            group_sweep(
                                qs_buf[st * hs:(st + 1) * hs, :],
                                k[0:(st + 1) * cs], v[0:(st + 1) * cs],
                                lambda s, st=st: masked_post_rows(
                                    s, st * hs, hs
                                ),
                                slice(st * hs, (st + 1) * hs), hs,
                            )

                    @pl.when(jnp.logical_not(can_split))
                    def _():
                        group_sweep(
                            qs_buf[...], k, v, masked_post, slice(None), sq
                        )
                else:
                    group_sweep(
                        qs_buf[...], k, v, masked_post, slice(None), sq
                    )

            chunk_interior = ((j + 1) * ck <= diag_lo0 + 1) & (
                (j + 1) * ck <= kv_len
            )

            @pl.when(chunk_interior)
            def _():
                interior_all()

            @pl.when(jnp.logical_not(chunk_interior))
            def _():
                boundary_all()

            return ()

        jax.lax.fori_loop(0, num_kv_tiles, body, (), unroll=False)

        # ---- normalize and write out (position-corrected)
        for g in range(group):
            l = l_buf[:, g * _LANES:g * _LANES + 1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_stage[:, g_lanes(g)] = (
                acc_buf[:, g_lanes(g)] * l_inv
            ).astype(o_stage.dtype)
        lane0 = pl.multiple_of(h * group * d, group * d)

        writes = []
        if packed_out:
            # tq writes straight into packed rows. For subtile st:
            #   p0    = p_base + st*tq        (position of its first row)
            #   dst_p = clip(p0, 0, q_len-tq) (never write past the request)
            #   src   = clip(dst_p - p_base, 0, sq-tq)
            # o_stage row r holds position p_base + r, so the write covers
            # positions [p_base+src, +tq) — always position-correct, and
            # always within [row0, row0+sq): in-bounds with no padding.
            # With 8-aligned cu every offset here is ≡ 0 (mod 8). Straddler
            # rewrites are idempotent; sub-tq tails spill forward onto rows
            # the NEXT request overwrites (the grid is sequential in b).
            regular = (q_len >= tq) | (p_base >= 0)
            for st in range(n_tq):
                p0 = p_base + st * tq
                dst_p = jnp.clip(p0, 0, jnp.maximum(q_len - tq, 0))
                # 8-aligned by construction under the aligned-cu contract
                # (p_base, q_len, tq all ≡ 0 mod 8) — hint it, Mosaic
                # cannot prove divisibility through the clips
                src = pl.multiple_of(
                    jnp.clip(dst_p - p_base, 0, sq - tq), 8
                )
                st_act = regular & (p0 < q_len) & (p0 + tq > 0)
                writes.append(
                    (st_act, src, pl.multiple_of(row0 + src, 8), tq)
                )
            # a clamp-shifted window of a sub-tq request has neither tq
            # rows of request nor tq rows of spill room: 8-row writes
            # (q_len ≡ 0 mod 8 under the aligned-cu contract)
            tiny = jnp.logical_not(regular)
            for w in range(tq // 8):
                src = pl.multiple_of(-p_base + w * 8, 8)
                writes.append(
                    (tiny & (w * 8 < q_len), src,
                     pl.multiple_of(row0 + src, 8), 8)
                )
        else:
            # slot writes at b*pitch + (cu[b]%8) + position: the window
            # round-down shift and the slot shift cancel, so dst =
            # b*pitch + sb0 + st*tq — always 8-aligned for ANY cu. Rows at
            # positions outside [0, q_len) land on slot padding the
            # compaction gather never reads. The wrapper pads q so the end
            # clamp never engages (p_base = sb0 - cu[b]%8 >= sb0 - 7).
            for st in range(n_tq):
                p0 = p_base + st * tq
                st_act = (p0 < q_len) & (p0 + tq > 0)
                dst = b * pitch + sb0 + st * tq
                writes.append((st_act, st * tq, dst, tq))

        def o_copy(src, dst, rows):
            return pltpu.make_async_copy(
                o_stage.at[pl.ds(src, rows)],
                o_hbm_ref.at[pl.ds(dst, rows), pl.ds(lane0, group * d)],
                o_sem,
            )

        for st_act, src, dst, rows in writes:
            @pl.when(st_act)
            def _(src=src, dst=dst, rows=rows):
                o_copy(src, dst, rows).start()
        for st_act, src, dst, rows in writes:
            @pl.when(st_act)
            def _(src=src, dst=dst, rows=rows):
                o_copy(src, dst, rows).wait()


def _prefill_sparse_kernel(
    # scalar prefetch
    q_starts_ref,  # [B]
    q_lens_ref,  # [B]
    kv_lens_ref,  # [B]
    block_tbl_ref,  # [B*max_blocks]
    cnt_ref,  # [B*Hkv*n_tm] int32 — active chunks per tile (causal-clamped)
    # inputs
    q_hbm_ref,  # [total_q_pad, Hq*D] ANY — lane-packed slotted rows
    k_pages_ref,  # [Hkv, nb, bs, D] ANY
    v_pages_ref,
    bits_hbm_ref,  # [B*Hkv*n_tm, G, n_chunks] int32 ANY — per-head bits
    list_hbm_ref,  # [B*Hkv*n_tm, 8, n_chunks] int32 ANY — row 0: chunk list
    ks_ref,  # [1, 1, n_ck, ck] f32 VMEM — per-token K scales (or dummy)
    # outputs
    o_hbm_ref,  # [total_q_pad, Hq*D] ANY
    # scratch
    q_buf,  # [SQ, G*D] bf16 — the GQA group lane-packed, ONE DMA
    k_buf,  # [2, pack*pcb, bs, D]
    v_buf,
    acc_buf,  # [SQ, G*D] f32
    m_buf,  # [SQ, G*128] f32
    l_buf,
    o_stage,
    bits_smem,  # SMEM [n_sub*G, n_chunks] int32 — row st*G+g
    list_smem,  # SMEM [8, n_chunks] int32 (row 0 = union chunk list)
    q_sem,
    kv_sems,
    bits_sem,
    list_sem,
    o_sem,
    *,
    tq: int,
    pcb: int,
    page_size: int,
    max_blocks: int,
    group: int,
    n_chunks: int,
    num_kv_heads: int,
    n_tm: int,  # superblocks per request slot
    n_sub: int,  # mask tiles per superblock (SQ = n_sub * tq)
    pack: int,
    pertoken_ks: bool,
    kv_e4m3: bool = False,
):
    """Block-sparse paged prefill (reference op #4,
    warp_spec_with_kvcache_blocksparse_fp8_dim128.cu / kHasMask).

    The mask arrives bit-packed: bits[b, hq, q_tile, chunk] has bit p set iff
    page p of that KV chunk is attended by that (head, q-tile). Each program
    (b, kv_head, q_tile):
      1. DMAs its group's bit rows into SMEM,
      2. compacts the union-active chunk list with a scalar loop (the TPU
         analog of the reference's "skip masked KV tiles" mainloop guard),
      3. streams ONLY active chunks through the double-buffered KV slab,
      4. applies the per-head per-page fine mask on the logits.
    Masked-out tiles cost neither DMA bytes nor MXU flops — the source of
    the reference's 3.16x sparse speedup (README.md:173). Rows with no
    active pages emit 0 (the reference emits NaN; callers keep the causal
    diagonal in the mask, hpc/attention.py:268-278).

    Round 5: superblock restructure mirroring the dense kernel —

    * q/o travel in the dense kernel's lane-packed [rows, Hq*D] layout:
      the GQA group is ONE [SQ, G*D] DMA each way, and the wrapper's two
      [Hq, total, D] transpose passes disappear (the same restructure
      measured 2.2x on the dense path, exp/prefill3d_iso.py).
    * Each program owns n_sub mask tiles (SQ = n_sub*tq rows) and streams
      the UNION of their active chunks once: per-tile programs re-DMA'd
      shared chunks up to n_sub times and fed the MXU [tq, ckt] dots;
      the superblock issues [SQ, ckt] dots and divides the per-program
      fixed costs (bits/list/q DMAs, grid steps) by n_sub. Chunks active
      for only SOME subtiles are masked out per 128-row band with a
      [1, ckt] per-(subtile, head) bit row that broadcasts over the
      band's sublanes for free — no row-expanded mask is materialized.
    """
    b = pl.program_id(0)
    h = pl.program_id(1)
    sbi = pl.program_id(2)
    ck = pcb * page_size
    sq = n_sub * tq

    q_start = q_starts_ref[b]
    q_len = q_lens_ref[b]
    kv_len = kv_lens_ref[b]
    kv_off = kv_len - q_len

    tile_active = sbi * sq < q_len

    @pl.when(tile_active)
    def _():
        # ---- one DMA fetches this superblock's per-(subtile, head) mask
        # bits AND its precomputed union chunk list (built vectorized
        # outside the kernel)
        flat = (b * num_kv_heads + h) * n_tm + sbi
        bits_cp = pltpu.make_async_copy(
            bits_hbm_ref.at[flat], bits_smem, bits_sem
        )
        bits_cp.start()
        list_cp = pltpu.make_async_copy(
            list_hbm_ref.at[flat], list_smem, list_sem
        )
        list_cp.start()

        row0 = pl.multiple_of(q_start + sbi * sq, tq)
        d = q_buf.shape[1] // group
        lane0 = pl.multiple_of(h * group * d, group * d)
        q_cp = pltpu.make_async_copy(
            q_hbm_ref.at[pl.ds(row0, sq), pl.ds(lane0, group * d)],
            q_buf,
            q_sem,
        )
        q_cp.start()

        cnt = cnt_ref[(b * num_kv_heads + h) * n_tm + sbi]
        bits_cp.wait()
        list_cp.wait()

        # pack PACK active columns per compute step: single-column tiles
        # leave the MXU mostly idle (64-wide matmuls); packing restores the
        # arithmetic width while still skipping masked columns entirely
        max_col = (max_blocks - 1) // pcb

        def start_pack(i_step, slot):
            copies = []
            for p in range(pack):
                e = jnp.minimum(i_step * pack + p, n_chunks - 1)
                col = jnp.minimum(list_smem[0, e], max_col)
                for pg in range(pcb):
                    phys = block_tbl_ref[b * max_blocks + col * pcb + pg]
                    copies.append(
                        pltpu.make_async_copy(
                            k_pages_ref.at[h, phys],
                            k_buf.at[slot, p * pcb + pg],
                            kv_sems.at[slot, 0],
                        )
                    )
                    copies.append(
                        pltpu.make_async_copy(
                            v_pages_ref.at[h, phys],
                            v_buf.at[slot, p * pcb + pg],
                            kv_sems.at[slot, 1],
                        )
                    )
            return copies

        cnt_steps = (cnt + pack - 1) // pack

        @pl.when(cnt > 0)
        def _():
            for c in start_pack(0, 0):
                c.start()

        m_buf[...] = jnp.full_like(m_buf, -jnp.inf)
        l_buf[...] = jnp.zeros_like(l_buf)
        acc_buf[...] = jnp.zeros_like(acc_buf)

        q_cp.wait()

        ckt = pack * ck
        # geometry as [1, ckt] ROWS + a [sq, 1] COLUMN: per-band masks
        # broadcast over sublanes for free, nothing row-expanded
        qpos_col = kv_off + sbi * sq + jax.lax.broadcasted_iota(
            jnp.int32, (sq, 1), 0
        )
        lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, ckt), 1)
        seg_row = lane_row // ck  # which packed column this lane belongs to
        within_row = lane_row % ck
        page_row = within_row // page_size

        def body(i, _):
            slot = i % 2

            @pl.when(i + 1 < cnt_steps)
            def _():
                for c in start_pack(i + 1, (i + 1) % 2):
                    c.start()

            for c in start_pack(i, slot):
                c.wait()
            k = _upk(k_buf[slot].reshape(ckt, k_buf.shape[-1]), kv_e4m3)
            v = _upk(v_buf[slot].reshape(ckt, v_buf.shape[-1]), kv_e4m3)

            # per-segment column ids / validity / per-(subtile, head) bits
            # from SMEM — all assembled as [1, ckt] rows
            kpos_row = within_row
            cols = []
            ks_rows = []
            for p in range(pack):
                e = jnp.minimum(i * pack + p, n_chunks - 1)
                valid = (i * pack + p) < cnt
                col = list_smem[0, e]
                cols.append(jnp.minimum(col, n_chunks - 1))
                base = jnp.where(valid, col * ck, kv_len)  # pads mask out
                kpos_row = kpos_row + jnp.where(seg_row == p, base, 0)
                if pertoken_ks:
                    kc_ = jnp.minimum(col, ks_ref.shape[2] - 1)
                    ks_rows.append(ks_ref[0, 0, kc_][None, :])  # [1, ck]

            # causal via broadcast compare ([1, ckt] vs [sq, 1]); the
            # kv_len bound is implied for real rows (invalid segments get
            # base = kv_len > qpos), padding rows attend garbage that is
            # never read back
            causal = kpos_row <= qpos_col
            if pertoken_ks:
                # QuantType-0 logit-side K scales, assembled per packed
                # segment (same trick as _decode_qt0_kernel; exact)
                ks_row = (
                    jnp.concatenate(ks_rows, axis=1)
                    if pack > 1
                    else ks_rows[0]
                )  # [1, ckt]

            for g in range(group):
                q = q_buf[:, g * d:(g + 1) * d]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if pertoken_ks:
                    s = s * ks_row
                # per-band fine mask: one [1, ckt] bit row per subtile,
                # applied to its 128-row slice (sublane broadcast is free)
                parts = []
                for st in range(n_sub):
                    bsum = jnp.zeros((1, ckt), jnp.int32)
                    for p in range(pack):
                        bv = bits_smem[st * group + g, cols[p]]
                        bsum = bsum + jnp.where(seg_row == p, bv, 0)
                    keep = (
                        jax.lax.shift_right_logical(bsum, page_row) & 1
                    ) == 1
                    rs = slice(st * tq, (st + 1) * tq)
                    parts.append(
                        jnp.where(
                            causal[rs] & keep, s[rs], MASK_VALUE
                        )
                    )
                s = jnp.concatenate(parts, axis=0) if n_sub > 1 else parts[0]
                gl = slice(g * _LANES, (g + 1) * _LANES)
                m_prev = m_buf[:, gl]
                l_prev = l_buf[:, gl]
                m_curr = jnp.broadcast_to(
                    jnp.max(s, axis=1, keepdims=True), m_prev.shape
                )
                m_next = jnp.maximum(m_prev, m_curr)
                alpha = jnp.exp2(m_prev - m_next)
                p_ = jnp.exp2(s - m_next[:, :1])
                l_buf[:, gl] = alpha * l_prev + jnp.broadcast_to(
                    jnp.sum(p_, axis=1, keepdims=True), l_prev.shape
                )
                m_buf[:, gl] = m_next
                o_curr = jax.lax.dot(
                    p_.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32
                )
                gd = slice(g * d, (g + 1) * d)
                acc_buf[:, gd] = acc_buf[:, gd] * alpha[:, :1] + o_curr
            return ()

        jax.lax.fori_loop(0, cnt_steps, body, (), unroll=False)

        # rows whose max logit never rose above MASK_VALUE had no active
        # (head, page) anywhere -> emit 0 (reference emits NaN; callers keep
        # the causal diagonal set so this is the padding/degenerate case)
        for g in range(group):
            gl = slice(g * _LANES, (g + 1) * _LANES)
            gd = slice(g * d, (g + 1) * d)
            l = l_buf[:, gl][:, :1]
            dead = m_buf[:, gl][:, :1] <= (0.5 * MASK_VALUE)
            l_inv = jnp.where(
                dead | (l == 0.0), 0.0, 1.0 / jnp.where(l == 0.0, 1.0, l)
            )
            o_stage[:, gd] = (acc_buf[:, gd] * l_inv).astype(o_stage.dtype)
        o_cp = pltpu.make_async_copy(
            o_stage,
            o_hbm_ref.at[pl.ds(row0, sq), pl.ds(lane0, group * d)],
            o_sem,
        )
        o_cp.start()
        o_cp.wait()


def _pack_mask_bits(block_mask, pcb: int, n_chunks: int):
    """[B, Hq, n_tm, n_tkv] {0,1} -> [B, Hq, n_tm, n_chunks] int32 where bit p
    of chunk j = mask for page j*pcb+p (pcb <= 30)."""
    b, hq, n_tm, n_tkv = block_mask.shape
    pad = n_chunks * pcb - n_tkv
    assert pad >= 0, (
        f"block_mask covers {n_tkv} pages but the page table has at most "
        f"{n_chunks * pcb}: check mask_tile_kv against the actual mask "
        f"granularity"
    )
    m = jnp.pad((block_mask != 0).astype(jnp.int32), ((0, 0),) * 3 + ((0, pad),))
    m = m.reshape(b, hq, n_tm, n_chunks, pcb)
    weights = jnp.left_shift(1, jnp.arange(pcb, dtype=jnp.int32))
    return jnp.sum(m * weights, axis=-1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tm", "n_sub", "tq", "pages_per_compute_block", "max_q_tiles",
        "pertoken_ks", "interpret",
    ),
)
def _prefill_sparse_pallas(
    q_rows,  # [total_q_pad, Hq*D] bf16 pre-scaled, slotted lane-packed rows
    k_pages,  # [Hkv, nb, bs, D]
    v_pages,
    q_starts,
    q_lens,
    kv_lens,
    block_ids,
    bits_flat,  # [B*Hkv*n_tm, n_sub*G, n_chunks] int32
    list_flat,  # [B*Hkv*n_tm, 8, n_chunks] int32 (row 0 = union chunk list)
    chunk_cnt,  # [B*Hkv*n_tm] int32
    ks_dense,  # [B, Hkv, n_ck, ck] f32 (dummy [B, Hkv, 1, 128] when unused)
    n_tm: int,  # superblocks per request slot
    n_sub: int,  # mask tiles per superblock
    tq: int,
    pages_per_compute_block: int,
    max_q_tiles: int,  # == n_tm (grid dim)
    pertoken_ks: bool = False,
    interpret: bool = False,
):
    total_q_pad = q_rows.shape[0]
    k_pages, kv_e4m3 = _kv_bits(k_pages)
    v_pages, _ = _kv_bits(v_pages)
    hkv, nb, bs, d = k_pages.shape
    dv = v_pages.shape[-1]
    assert dv == d, "lane-packed sparse prefill assumes D == Dv"
    hq = q_rows.shape[1] // d
    group = hq // hkv
    b = kv_lens.shape[0]
    pcb = pages_per_compute_block
    max_blocks = block_ids.shape[1]
    n_chunks = bits_flat.shape[-1]
    n_ck, ck_s = ks_dense.shape[2], ks_dense.shape[3]
    # pack enough active columns per compute step for a ~1024-wide kv tile
    # (same lesson as the dense chunk size: wide matmuls feed the MXU; the
    # per-page DMAs are unchanged, only the compute step widens)
    pack = max(1, 1024 // (pcb * bs))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b, hkv, max_q_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, 1, n_ck, ck_s), lambda bi, hi, ti, *_: (bi, hi, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((n_sub * tq, group * d), jnp.bfloat16),
            pltpu.VMEM((2, pack * pcb, bs, d), k_pages.dtype),
            pltpu.VMEM((2, pack * pcb, bs, dv), v_pages.dtype),
            pltpu.VMEM((n_sub * tq, group * dv), jnp.float32),
            pltpu.VMEM((n_sub * tq, group * _LANES), jnp.float32),
            pltpu.VMEM((n_sub * tq, group * _LANES), jnp.float32),
            pltpu.VMEM((n_sub * tq, group * dv), jnp.bfloat16),
            pltpu.SMEM((n_sub * group, n_chunks), jnp.int32),
            pltpu.SMEM((8, n_chunks), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _prefill_sparse_kernel,
        tq=tq,
        pcb=pcb,
        page_size=bs,
        max_blocks=max_blocks,
        group=group,
        n_chunks=n_chunks,
        num_kv_heads=hkv,
        n_tm=n_tm,
        n_sub=n_sub,
        pack=pack,
        pertoken_ks=pertoken_ks,
        kv_e4m3=kv_e4m3,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((total_q_pad, hq * dv), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            # superblock scratch + [SQ, ckt] softmax temporaries exceed the
            # 16MB default scoped-vmem limit at n_sub=8
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        q_starts,
        q_lens,
        kv_lens,
        jnp.pad(block_ids.reshape(-1), (0, pcb)),
        chunk_cnt,
        q_rows,
        k_pages,
        v_pages,
        bits_flat,
        list_flat,
        ks_dense,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "tq", "n_tq", "pages_per_compute_block", "max_q_tiles",
        "packed_out", "pertoken_ks", "interpret",
    ),
)
def _prefill_pallas(
    q_rows,  # [total_rows(+pad), Hq*D] bf16 — the model's packed rows
    k_pages,  # [Hkv, nb, bs, D]
    v_pages,
    cu,  # [B+1] int32 packed row offsets (cu_seqlens_q)
    kv_lens,  # [B] int32
    block_ids,  # [B, max_blocks]
    ks_dense,  # [B, Hkv, n_ck, ck] f32 (dummy [B, Hkv, 1, 128] when unused)
    scale,  # [1, 1] f32 — softmax scale * log2(e), applied in-kernel
    tq: int,
    n_tq: int,  # row subtiles per superblock (SQ = n_tq * tq)
    pages_per_compute_block: int,
    max_q_tiles: int,  # superblocks per request
    packed_out: bool,  # True: packed-rows output (8-aligned cu contract);
    # False: slotted output [B*(max_q_pad+8), Hq*D] for the wrapper gather
    pertoken_ks: bool = False,
    interpret: bool = False,
):
    total_rows = q_rows.shape[0]
    k_pages, kv_e4m3 = _kv_bits(k_pages)
    v_pages, _ = _kv_bits(v_pages)
    hkv, nb, bs, d = k_pages.shape[0], k_pages.shape[1], k_pages.shape[2], k_pages.shape[3]
    dv = v_pages.shape[-1]
    assert dv == d, "row-major prefill assumes D == Dv"
    hq = q_rows.shape[1] // d
    group = hq // hkv
    b = kv_lens.shape[0]
    pcb = pages_per_compute_block
    max_blocks = block_ids.shape[1]
    sq = n_tq * tq
    pitch = max_q_tiles * sq + 8
    out_rows = total_rows if packed_out else b * pitch

    n_ck, ck_s = ks_dense.shape[2], ks_dense.shape[3]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, hkv, max_q_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, 1, n_ck, ck_s), lambda bi, hi, ti, *_: (bi, hi, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1), lambda bi, hi, ti, *_: (0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, sq, group * d), jnp.bfloat16),
            pltpu.VMEM((sq, group * d), jnp.bfloat16),
            pltpu.VMEM((4, pcb, bs, d), k_pages.dtype),
            pltpu.VMEM((4, pcb, bs, dv), v_pages.dtype),
            pltpu.VMEM((sq, group * dv), jnp.float32),
            pltpu.VMEM((sq, group * _LANES), jnp.float32),
            pltpu.VMEM((sq, group * _LANES), jnp.float32),
            pltpu.VMEM((sq, group * dv), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((4, 2)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _prefill_kernel,
        tq=tq,
        n_tq=n_tq,
        pcb=pcb,
        page_size=bs,
        max_blocks=max_blocks,
        group=group,
        d=d,
        total_rows=total_rows,
        packed_out=packed_out,
        pitch=pitch,
        pertoken_ks=pertoken_ks,
        kv_e4m3=kv_e4m3,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, hq * dv), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            # b must iterate sequentially: sub-tile write spill of request
            # b is overwritten by request b+1's programs
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            # superblock scratch (q double-buffer + f32 acc/m/l over SQ
            # rows) plus the whole-chunk [SQ, ck] logit arrays exceed the
            # 16MB default scoped-vmem limit; v5e has 128MB physical VMEM
            vmem_limit_bytes=100 << 20,
        ),
        interpret=interpret,
    )(
        cu,
        kv_lens,
        jnp.pad(block_ids.reshape(-1), (0, pcb)),
        q_rows,
        k_pages,
        v_pages,
        ks_dense,
        scale,
    )


def _prefill_nhd_fused_kernel(
    # scalar prefetch
    q_starts_ref,  # [B] tq-aligned row offset of each request in q_hbm
    q_lens_ref,  # [B]
    kv_lens_ref,  # [B]
    block_tbl_ref,  # [B*max_blocks]
    # inputs
    q_hbm_ref,  # [Hq, total_q_pad, D] ANY
    kv_pages_ref,  # [nb, 2*bs, Hkv*D] ANY — slot-leading fused pages
    # outputs
    o_hbm_ref,  # [Hq, total_q_pad, D] ANY (bf16)
    # scratch
    q_buf,  # [Hq, TQ, D] bf16
    kv_buf,  # [2, pcb, 2*bs, Hkv*D]
    acc_buf,  # [Hq, TQ, D] f32
    m_buf,  # [Hq, TQ, LANES] f32
    l_buf,
    o_stage,  # [Hq, TQ, D] bf16
    q_sem,
    kv_sems,  # (2,)
    o_sem,
    *,
    tq: int,
    pcb: int,
    page_size: int,
    max_blocks: int,
    num_kv_heads: int,
    group: int,
    d: int,
    kv_e4m3: bool = False,
):
    """All-heads prefill over the slot-leading fused cache (NHD_FUSED): one
    DMA per page moves K|V rows of every kv head, and every head's q tile
    attends from the same chunk buffer. This is the serving engine's
    chunked-prefill read path — the per-head HND kernel would need the int8
    slab unpacked (an O(cache) repack per chunk per layer).

    KV traffic is (q_len/tq) x the prefix bytes — identical to the per-head
    kernel — but descriptors are hkv x fewer and the q-tile loop is shared.
    """
    b = pl.program_id(0)
    tqi = pl.program_id(1)
    ck = pcb * page_size
    hq = num_kv_heads * group

    q_start = q_starts_ref[b]
    q_len = q_lens_ref[b]
    kv_len = kv_lens_ref[b]
    kv_off = kv_len - q_len

    tile_active = tqi * tq < q_len

    @pl.when(tile_active)
    def _():
        row0 = pl.multiple_of(q_start + tqi * tq, tq)
        for hg in range(hq):
            pltpu.make_async_copy(
                q_hbm_ref.at[hg, pl.ds(row0, tq), :], q_buf.at[hg], q_sem
            ).start()

        kv_hi = jnp.minimum(kv_len, kv_off + (tqi + 1) * tq)
        num_kv_tiles = jnp.maximum((kv_hi + ck - 1) // ck, 1)

        def start_kv(j, slot):
            return MultiPageCopy(
                kv_pages_ref,
                kv_buf,
                kv_sems.at[slot],
                block_tbl_ref,
                head=None,
                page_start=b * max_blocks + j * pcb,
                num_pages=pcb,
                slot=slot,
            )

        start_kv(0, 0).start()

        m_buf[...] = jnp.full_like(m_buf, -jnp.inf)
        l_buf[...] = jnp.zeros_like(l_buf)
        acc_buf[...] = jnp.zeros_like(acc_buf)

        for hg in range(hq):
            pltpu.make_async_copy(
                q_hbm_ref.at[hg, pl.ds(row0, tq), :], q_buf.at[hg], q_sem
            ).wait()

        def body(j, _):
            slot = j % 2

            @pl.when(j + 1 < num_kv_tiles)
            def _():
                start_kv(j + 1, (j + 1) % 2).start()

            start_kv(j, slot).wait()

            def update(masked: bool):
                if masked:
                    kpos = j * ck + jax.lax.broadcasted_iota(
                        jnp.int32, (tq, ck), 1
                    )
                    qpos = kv_off + tqi * tq + jax.lax.broadcasted_iota(
                        jnp.int32, (tq, ck), 0
                    )
                    mask = (kpos <= qpos) & (kpos < kv_len)
                for h in range(num_kv_heads):
                    k = _upk(
                        kv_buf[
                            slot, :, :page_size, pl.ds(h * d, d)
                        ].reshape(ck, d),
                        kv_e4m3,
                    )
                    v = _upk(
                        kv_buf[
                            slot, :, page_size:, pl.ds(h * d, d)
                        ].reshape(ck, d),
                        kv_e4m3,
                    )
                    for g in range(group):
                        hg = h * group + g
                        s = jax.lax.dot_general(
                            q_buf[hg],
                            k,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        if masked:
                            s = jnp.where(mask, s, MASK_VALUE)
                        m_prev = m_buf[hg]
                        l_prev = l_buf[hg]
                        m_curr = jnp.broadcast_to(
                            jnp.max(s, axis=1, keepdims=True), m_prev.shape
                        )
                        m_next = jnp.maximum(m_prev, m_curr)
                        alpha = jnp.exp2(m_prev - m_next)
                        p = jnp.exp2(s - m_next[:, :1])
                        l_buf[hg] = alpha * l_prev + jnp.broadcast_to(
                            jnp.sum(p, axis=1, keepdims=True), l_prev.shape
                        )
                        m_buf[hg] = m_next
                        o_curr = jax.lax.dot(
                            p.astype(jnp.bfloat16),
                            v,
                            preferred_element_type=jnp.float32,
                        )
                        acc_buf[hg] = acc_buf[hg] * alpha[:, :1] + o_curr

            interior = ((j + 1) * ck <= kv_off + tqi * tq + 1) & (
                (j + 1) * ck <= kv_len
            )

            @pl.when(interior)
            def _():
                update(masked=False)

            @pl.when(jnp.logical_not(interior))
            def _():
                update(masked=True)

            return ()

        jax.lax.fori_loop(0, num_kv_tiles, body, (), unroll=False)

        for hg in range(hq):
            l = l_buf[hg][:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_stage[hg] = (acc_buf[hg] * l_inv).astype(o_stage.dtype)
            pltpu.make_async_copy(
                o_stage.at[hg], o_hbm_ref.at[hg, pl.ds(row0, tq), :], o_sem
            ).start()
        for hg in range(hq):
            pltpu.make_async_copy(
                o_stage.at[hg], o_hbm_ref.at[hg, pl.ds(row0, tq), :], o_sem
            ).wait()


def _prefill_nhd_fused_pallas(
    q_t,  # [Hq, total_q_pad, D] bf16 pre-scaled, per-request tq-aligned rows
    kv_pages,  # [nb, 2*bs, Hkv*D]
    q_starts,
    q_lens,
    kv_lens,
    block_ids,
    num_kv_heads: int,
    tq: int,
    pages_per_compute_block: int,
    max_q_tiles: int,
    interpret: bool = False,
):
    hq, total_q_pad, d = q_t.shape
    kv_pages, kv_e4m3 = _kv_bits(kv_pages)
    nb, bs2, hd = kv_pages.shape
    bs = bs2 // 2
    hkv = num_kv_heads
    group = hq // hkv
    b = kv_lens.shape[0]
    pcb = pages_per_compute_block
    max_blocks = block_ids.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, max_q_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((hq, tq, d), jnp.bfloat16),
            pltpu.VMEM((2, pcb, bs2, hd), kv_pages.dtype),
            pltpu.VMEM((hq, tq, d), jnp.float32),
            pltpu.VMEM((hq, tq, _LANES), jnp.float32),
            pltpu.VMEM((hq, tq, _LANES), jnp.float32),
            pltpu.VMEM((hq, tq, d), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _prefill_nhd_fused_kernel,
        tq=tq,
        pcb=pcb,
        page_size=bs,
        max_blocks=max_blocks,
        num_kv_heads=hkv,
        group=group,
        d=d,
        kv_e4m3=kv_e4m3,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hq, total_q_pad, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        q_starts,
        q_lens,
        kv_lens,
        jnp.pad(block_ids.reshape(-1), (0, pcb)),
        q_t,
        kv_pages,
    )


def attention_with_kvcache_prefill(
    q,
    kcache,
    vcache,
    cu_seqlens_q,
    block_ids,
    seqlens_kvcache,
    max_seqlens_q: int,
    qscale=None,
    kscale=None,
    vscale=None,
    quant_type: QuantType = QuantType.QPERTOKEN_PERHEAD_KPERTENSOR_VPERTENSOR,
    block_mask=None,
    *,
    mask_tile_q: int = 128,
    mask_tile_kv: int = 128,
    sm_scale: float | None = None,
    tq: int | None = None,
    pages_per_compute_block: int | None = None,
    cache_layout: str = "NHD",
    impl: str = "auto",
    aligned_seq_starts: bool = False,
):
    """Paged-cache varlen prefill (reference ops #2-#4). Returns bf16
    [total_q, Hq, Dv].

    q: [total_q, Hq, D] bf16, or fp8 with qscale [B, Hq, max_q_pad]
    (per-token-per-head). Caches NHD [nb, bs, Hkv, D] (or HND with
    cache_layout="HND"; or the slot-leading fused slab [nb, 2*bs, Hkv*D]
    with cache_layout="NHD_FUSED" and vcache=None — the serving engine's
    quantized layout, read in place by an all-heads kernel with no cache
    repack). block_mask enables the block-sparse path.

    aligned_seq_starts: caller asserts EVERY cu_seqlens_q entry (incl. the
    last) is a multiple of 8 — the serving engine's packing contract. The
    dense kernel then reads q and writes o directly in packed rows with
    zero wrapper passes. Violating the contract SILENTLY CORRUPTS output
    (unaligned DMA row offsets, straddler spills across requests); when
    cu_seqlens_q is a concrete (non-traced) array the contract is checked
    eagerly here. With the default False, arbitrary cu is handled via
    slotted kernel output + one compaction gather.
    """
    if aligned_seq_starts and not isinstance(
        cu_seqlens_q, jax.core.Tracer
    ):
        import numpy as _np

        _cu = _np.asarray(cu_seqlens_q)
        if (_cu % 8).any():
            raise ValueError(
                "aligned_seq_starts=True requires every cu_seqlens_q entry "
                f"to be a multiple of 8, got {_cu.tolist()} — unaligned "
                "starts silently corrupt packed-row writes; pass "
                "aligned_seq_starts=False for arbitrary packing"
            )
    if tq is None:
        # sparse requires q-tile == mask tile; dense long prefills run
        # tq=256 — each q tile streams the whole KV prefix, so doubling tq
        # halves KV DMA traffic per FLOP (tq=128 sits right at the
        # MXU-flops:DMA-bytes break-even on v5e).
        tq = (
            mask_tile_q
            if block_mask is not None
            else (256 if max_seqlens_q >= 2048 else 128)
        )
        if cache_layout == "NHD_FUSED":
            # the all-heads kernel's q/acc/m/l scratch scales with Hq, not
            # the GQA group — clamp tq so the scratch stays within ~8MB
            hq_all, d_all = q.shape[1], q.shape[2]
            while tq > 64 and hq_all * tq * (8 * d_all + 1024) > (8 << 20):
                tq //= 2
    fused_nhd = cache_layout == "NHD_FUSED"
    if cache_layout == "NHD":
        k_pages = nhd_to_hnd(kcache)
        v_pages = nhd_to_hnd(vcache)
        kcache_n, vcache_n = kcache, vcache
    elif fused_nhd:
        # slot-leading fused slab [nb, 2*bs, Hkv*D] (pack_kv_fused_nhd);
        # vcache unused. The oracle path reads NHD VIEWS of the slab —
        # slice + reshape, no transpose.
        d_q = q.shape[-1]
        nb_f, bs2_f, hd_f = kcache.shape
        hkv_f = hd_f // d_q
        bs_f = bs2_f // 2
        kv_slab = kcache
        kcache_n = kv_slab[:, :bs_f].reshape(nb_f, bs_f, hkv_f, d_q)
        vcache_n = kv_slab[:, bs_f:].reshape(nb_f, bs_f, hkv_f, d_q)
        k_pages = v_pages = None
    else:
        k_pages, v_pages = kcache, vcache
        kcache_n = jnp.transpose(kcache, (1, 2, 0, 3))
        vcache_n = jnp.transpose(vcache, (1, 2, 0, 3))

    hkv = hkv_f if fused_nhd else k_pages.shape[0]
    is_fp8 = (kv_slab if fused_nhd else k_pages).dtype != jnp.bfloat16
    pertoken_k = is_fp8 and QuantType(quant_type) in (
        QuantType.QPERTOKEN_PERHEAD_KPERTOKEN_PERHEAD_VPERHEAD,
        QuantType.QPERTOKEN_PERHEAD_KPERTOKEN_PERHEAD_VPERHEAD_QKHADAMARD,
    )
    # QuantType-0 fast path: one fp8 K scale per (token, kv-head) (paged
    # [nb, bs, Hkv, 1]) is applied to the LOGITS in-kernel, exactly as
    # _decode_qt0_kernel does; grouped-D scale layouts fall back to the
    # oracle
    pertoken_fast = (
        pertoken_k and kscale is not None and kscale.shape[-1] == 1
    )

    sparse = block_mask is not None
    if sparse and (
        fused_nhd or mask_tile_q != tq or mask_tile_kv % k_pages.shape[2]
    ):
        # the Pallas sparse kernel requires q-tile == mask tile_m and
        # page-aligned kv mask tiles; anything else runs the oracle path
        sparse = False
    if (
        impl == "ref"
        or (pertoken_k and not pertoken_fast)
        or (block_mask is not None and not sparse)
    ):
        return attention_with_kvcache_prefill_ref(
            q,
            kcache_n,
            vcache_n,
            cu_seqlens_q,
            block_ids,
            seqlens_kvcache,
            max_seqlens_q,
            qscale=qscale,
            kscale=kscale,
            vscale=vscale,
            quant_type=quant_type,
            block_mask=block_mask,
            mask_tile_q=mask_tile_q,
            mask_tile_kv=mask_tile_kv,
        )

    total_q, hq, d = q.shape
    b = seqlens_kvcache.shape[0]
    scale = (1.0 / (d**0.5)) if sm_scale is None else sm_scale
    if is_fp8 and kscale is not None and not pertoken_fast:
        scale = scale * kscale.reshape(()).astype(jnp.float32)
    # Pallas kernels run softmax in the log2 domain (exp2 on the VPU saves
    # a multiply per logit vs exp): fold log2(e) into the q pre-scale.
    scale_log2 = scale * 1.4426950408889634
    # The dense kernel applies the scale itself on the q tile in VMEM; a
    # wrapper-side pass costs 3 full HBM round trips over q. Rows are only
    # pre-scaled when per-token qscales or a non-bf16 q force it (and for
    # the sparse/all-heads kernels, which take pre-scaled rows).
    prescale_rows = (
        sparse or fused_nhd or qscale is not None or q.dtype != jnp.bfloat16
    )
    if prescale_rows:
        qf = q.astype(jnp.float32)
        if qscale is not None:
            # scatter per-(req, pos, head) scale onto packed rows
            row = jnp.arange(total_q, dtype=jnp.int32)
            req = jnp.searchsorted(
                cu_seqlens_q[1:], row, side="right"
            ).astype(jnp.int32)
            req = jnp.minimum(req, b - 1)
            pos = row - cu_seqlens_q[req]
            qs = qscale[req, :, jnp.minimum(pos, qscale.shape[-1] - 1)]
            qf = qf * qs[..., None]
        qb = (qf * scale_log2).astype(jnp.bfloat16)
        kernel_scale = jnp.ones((1, 1), jnp.float32)
    else:
        qb = q
        kernel_scale = jnp.full((1, 1), scale_log2, jnp.float32)

    cu = cu_seqlens_q.astype(jnp.int32)
    q_lens = cu[1:] - cu[:-1]

    def fold_vscale(out):
        if is_fp8 and vscale is not None:
            vs = vscale.astype(jnp.float32).reshape(-1)
            if vs.shape[0] == 1:
                return (out.astype(jnp.float32) * vs[0]).astype(jnp.bfloat16)
            # QuantType-0 per-kv-head V scale: out = P @ (V_fp8 * vs[h]) =
            # (P @ V_fp8) * vs[h] — exact, folded per q-head group
            vs_q = jnp.repeat(vs, hq // hkv)  # [Hq]
            return (out.astype(jnp.float32) * vs_q[None, :, None]).astype(
                jnp.bfloat16
            )
        return out

    # ---- dense path: the kernel reads q DIRECTLY from the packed
    # [total_q, Hq*D] rows (window starts rounded down to the sublane
    # tile, writes position-corrected) — no slot repack. With 8-aligned
    # request starts (aligned_seq_starts=True, the serving engine's
    # packing contract) there are ZERO wrapper passes; otherwise the
    # kernel writes 8-aligned slots and ONE gather compacts them.
    if not (sparse or fused_nhd):
        # superblock sizing: per row, q double-buffer (4*GD B) + scaled q
        # (2*GD) + f32 acc (4*GD) + o staging (2*GD) + f32 m/l (1024*G)
        group_ = hq // hkv
        row_bytes = 12 * group_ * d + 1024 * group_
        budget = 11 << 20  # leave ~3MB for the KV slabs + compiler slack
        n_tq = max(1, min(8, budget // (row_bytes * tq)))
        n_tq = min(n_tq, cdiv(int(max_seqlens_q), tq), max(total_q // tq, 1))
        sq_blk = n_tq * tq
        # slotted windows start up to 7 rows below cu[b] (round-down to the
        # sublane tile), so superblock coverage must extend 7 rows past
        # max_seqlens_q or a request ending exactly at a superblock
        # boundary leaves its last (cu[b] % 8) rows unwritten
        packed = aligned_seq_starts and total_q >= tq and total_q % 8 == 0
        max_q_tiles = cdiv(
            int(max_seqlens_q) + (0 if packed else 7), sq_blk
        )
        pitch = max_q_tiles * sq_blk + 8
        page_size = k_pages.shape[2]
        if pages_per_compute_block is None:
            # Large KV chunks keep the MXU fed: 2048-token chunks more
            # than double measured prefill TFLOPs at 8K-32K contexts vs
            # 256-token chunks (v5e: 37 -> 96 TFLOP/s at 32K). With a
            # multi-tile superblock resident (n_tq >= 2) the chunk drops
            # to 1024 cols to keep K+V slabs + row scratch inside the
            # VMEM budget.
            chunk_cols = 1024 if n_tq >= 2 else 2048
            pages_per_compute_block = max(
                1, min(chunk_cols // page_size, block_ids.shape[1])
            )

        def gather_ks_dense(pcb_):
            if not pertoken_fast:
                return jnp.zeros((b, hkv, 1, 128), jnp.float32)
            ck_ = pcb_ * page_size
            n_ck = cdiv(block_ids.shape[1], pcb_)
            ks = kscale.astype(jnp.float32).reshape(
                k_pages.shape[1], page_size, hkv
            )
            tbl = jnp.maximum(block_ids.astype(jnp.int32), 0)
            ks_g = ks[tbl]  # [B, max_blocks, bs, Hkv]
            ks_d = jnp.transpose(ks_g, (0, 3, 1, 2)).reshape(
                b, hkv, block_ids.shape[1] * page_size
            )
            pad_ = n_ck * ck_ - ks_d.shape[-1]
            if pad_:
                ks_d = jnp.pad(ks_d, ((0, 0), (0, 0), (0, pad_)))
            return ks_d.reshape(b, hkv, n_ck, ck_)

        # the QKV projection's native output IS 2D rows; for the 3D
        # public input this reshape is one relayout pass (the serving
        # engine feeds 2D rows to _prefill_pallas via this same wrapper)
        qb_rows = qb.reshape(total_q, hq * d)
        if not packed:
            # pad q so clamp-free slotted windows never overhang the array
            qb_rows = jnp.pad(qb_rows, ((0, sq_blk), (0, 0)))
        o_rows = _prefill_pallas(
            qb_rows,
            k_pages,
            v_pages,
            cu,
            seqlens_kvcache.astype(jnp.int32),
            jnp.maximum(block_ids.astype(jnp.int32), 0),
            gather_ks_dense(pages_per_compute_block),
            kernel_scale,
            tq,
            n_tq,
            pages_per_compute_block,
            max_q_tiles,
            packed_out=packed,
            pertoken_ks=pertoken_fast,
            interpret=interpret_default(),
        )
        if not packed:
            # compact slots -> packed rows: position p of request r lives
            # at slot row r*pitch + (cu[r]%8) + p (the kernel's window
            # round-down shift and the slot shift cancel)
            prow = jnp.arange(total_q, dtype=jnp.int32)
            preq = jnp.minimum(
                jnp.searchsorted(cu[1:], prow, side="right").astype(
                    jnp.int32
                ),
                b - 1,
            )
            psrc = preq * pitch + (cu[preq] % 8) + (prow - cu[preq])
            o_rows = jnp.take(o_rows, psrc, axis=0)
        out = o_rows.reshape(total_q, hq, o_rows.shape[-1] // hq)
        return fold_vscale(out)

    # ---- sparse / NHD_FUSED paths: per-request tq-aligned slot repack.
    # The sparse kernel reads lane-packed [rows, Hq*D] slots (round-5
    # restructure — row copies only, no transpose); the NHD_FUSED all-heads
    # kernel still reads head-major [Hq, rows, D] tiles.
    n_tq = 1
    sq_blk = tq
    if sparse:
        # Sparse superblocks (n_sub mask tiles per program, union chunk
        # stream) amortize fixed costs ONLY when the mask is correlated
        # across adjacent q tiles and heads: at an uncorrelated ~20% keep
        # the union over n_sub*G (tile, head) pairs activates nearly every
        # chunk (1 - 0.8^32 ≈ 0.999 at n_sub=8) and the skip ratio — the
        # entire point of sparsity — dies (measured: b1_32k sparse fell
        # from 1.82x to 0.92x vs dense). Default n_sub=1 (per-tile
        # streaming); HPC_SPARSE_NSUB overrides for workloads whose masks
        # are known block-correlated.
        import os as _os

        group_v = hq // k_pages.shape[0]
        row_b = 8 * group_v * d + 1024 * group_v
        n_sub = max(
            1,
            min(int(_os.environ.get("HPC_SPARSE_NSUB", "1")),
                (10 << 20) // (row_b * tq),
                cdiv(int(max_seqlens_q), tq)),
        )
        sq_blk = n_sub * tq
    max_q_pad = round_up(int(max_seqlens_q), sq_blk)
    total_q_pad = b * max_q_pad
    q_starts = jnp.arange(b, dtype=jnp.int32) * max_q_pad
    if sparse:
        qb_rows = jnp.pad(
            qb.reshape(total_q, hq * d), ((0, max_q_pad), (0, 0))
        )
        q_slot = jnp.concatenate(
            [
                jax.lax.dynamic_slice(
                    qb_rows, (cu[i], 0), (max_q_pad, hq * d)
                )
                for i in range(b)
            ],
            axis=0,
        )
    else:
        qT = jnp.transpose(qb, (1, 0, 2))
        qT = jnp.pad(qT, ((0, 0), (0, max_q_pad), (0, 0)))
        q_t = jnp.concatenate(
            [
                jax.lax.dynamic_slice(qT, (0, cu[i], 0), (hq, max_q_pad, d))
                for i in range(b)
            ],
            axis=1,
        )

    page_size = bs_f if fused_nhd else k_pages.shape[2]
    if pages_per_compute_block is None:
        if sparse:
            # one mask column per compute chunk: larger chunks are active if
            # ANY of their pages is kept, which destroys the skip ratio
            pages_per_compute_block = max(mask_tile_kv // page_size, 1)
        else:
            pages_per_compute_block = max(
                1, min(2048 // page_size, block_ids.shape[1])
            )
            # fused slabs carry ALL heads: cap the double buffer at ~2MB
            slab = kcache.shape[1] * kcache.shape[2] * kcache.dtype.itemsize
            pages_per_compute_block = max(
                1, min(pages_per_compute_block, (1 << 20) // slab)
            )

    max_q_tiles = max_q_pad // sq_blk  # q tiles per request slot
    max_blocks_tbl = block_ids.shape[1]

    def gather_ks(pcb_):
        """Per-token K scales (paged [nb, bs, Hkv, 1]) -> dense
        [B, Hkv, n_ck, ck] rows through the page table (4 bytes/token,
        ~3% of the fp8 K traffic) so the kernel can scale logits per kv
        column; mirrors the decode QuantType-0 gather."""
        if not pertoken_fast:
            return jnp.zeros((b, hkv, 1, 128), jnp.float32)
        hkv_g = hkv
        ck_ = pcb_ * page_size
        n_ck = cdiv(max_blocks_tbl, pcb_)
        ks = kscale.astype(jnp.float32).reshape(
            k_pages.shape[1], page_size, hkv_g
        )  # [nb, bs, Hkv]
        tbl = jnp.maximum(block_ids.astype(jnp.int32), 0)
        ks_g = ks[tbl]  # [B, max_blocks, bs, Hkv]
        ks_d = jnp.transpose(ks_g, (0, 3, 1, 2)).reshape(
            b, hkv_g, max_blocks_tbl * page_size
        )
        pad_ = n_ck * ck_ - max_blocks_tbl * page_size
        if pad_:
            ks_d = jnp.pad(ks_d, ((0, 0), (0, 0), (0, pad_)))
        return ks_d.reshape(b, hkv_g, n_ck, ck_)

    if sparse:
        pcb = pages_per_compute_block
        if pcb > 16:  # bits per chunk live in one int32
            pcb = 16
        pages_per_tile = mask_tile_kv // page_size
        # expand mask kv-cols to page granularity, then bit-pack per chunk;
        # the chunk dim is padded to a lane multiple (128) because the
        # per-tile bits row is DMA'd HBM->SMEM inside the kernel
        bm_pages = jnp.repeat(block_mask, pages_per_tile, axis=-1)
        n_chunks = round_up(cdiv(block_ids.shape[1], pcb), 128)
        mask_bits = _pack_mask_bits(bm_pages, pcb, n_chunks)
        n_tiles_pad = max_q_tiles * n_sub  # mask tiles incl. slot padding
        if mask_bits.shape[2] < n_tiles_pad:
            mask_bits = jnp.pad(
                mask_bits,
                ((0, 0), (0, 0),
                 (0, n_tiles_pad - mask_bits.shape[2]), (0, 0)),
            )
        mask_bits = mask_bits[:, :, :n_tiles_pad]

        # active-chunk CSR, built vectorized here (the kernel only DMAs
        # its superblock's rows): per-tile causal clamp, then union over
        # the GQA group AND the superblock's n_sub tiles (chunks active
        # for only some subtiles are masked per 128-row band in-kernel),
        # actives sorted to the front
        hkv_ = k_pages.shape[0]
        group_ = hq // hkv_
        n_tm = n_tiles_pad
        bits4 = mask_bits.reshape(b, hkv_, group_, n_tm, n_chunks)
        union = jnp.any(bits4 != 0, axis=2)  # [B, Hkv, n_tm, n_chunks]
        kv_lens_i = seqlens_kvcache.astype(jnp.int32)
        kv_off = kv_lens_i - q_lens  # [B]
        ckt = pcb * page_size
        kv_hi = jnp.minimum(
            kv_lens_i[:, None],
            kv_off[:, None] + (jnp.arange(n_tm, dtype=jnp.int32)[None] + 1) * tq,
        )  # [B, n_tm]
        lim = jnp.maximum((kv_hi + ckt - 1) // ckt, 1)  # chunks in causal range
        cid = jnp.arange(n_chunks, dtype=jnp.int32)
        union = union & (cid[None, None, None, :] < lim[:, None, :, None])
        n_sb = max_q_tiles
        union_sb = jnp.any(
            union.reshape(b, hkv_, n_sb, n_sub, n_chunks), axis=3
        )  # [B, Hkv, n_sb, n_chunks]
        chunk_list = jnp.sort(
            jnp.where(union_sb, cid, n_chunks), axis=-1
        ).astype(jnp.int32)
        chunk_cnt = (
            jnp.sum(union_sb, axis=-1).astype(jnp.int32).reshape(-1)
        )  # [B*Hkv*n_sb]
        # flat leading dim keeps the per-superblock DMAs on an untiled
        # axis; bits row st*G+g holds subtile st, head g
        bits_flat = jnp.transpose(
            bits4.reshape(b, hkv_, group_, n_sb, n_sub, n_chunks),
            (0, 1, 3, 4, 2, 5),
        ).reshape(b * hkv_ * n_sb, n_sub * group_, n_chunks)
        list_flat = jnp.broadcast_to(
            chunk_list.reshape(b * hkv_ * n_sb, 1, n_chunks),
            (b * hkv_ * n_sb, 8, n_chunks),
        )

        o_sl = _prefill_sparse_pallas(
            q_slot,
            k_pages,
            v_pages,
            q_starts,
            q_lens,
            kv_lens_i,
            jnp.maximum(block_ids.astype(jnp.int32), 0),
            bits_flat,
            list_flat,
            chunk_cnt,
            gather_ks(pcb),
            n_sb,
            n_sub,
            tq,
            pcb,
            max_q_tiles,
            pertoken_ks=pertoken_fast,
            interpret=interpret_default(),
        )
        # compact slots -> packed rows (row gather; no transpose)
        prow = jnp.arange(total_q, dtype=jnp.int32)
        preq = jnp.minimum(
            jnp.searchsorted(cu[1:], prow, side="right").astype(jnp.int32),
            b - 1,
        )
        psrc = preq * max_q_pad + (prow - cu[preq])
        out = jnp.take(o_sl, psrc, axis=0).reshape(total_q, hq, d)
        return fold_vscale(out)

    if fused_nhd:
        o_t = _prefill_nhd_fused_pallas(
            q_t,
            kv_slab,
            q_starts,
            q_lens,
            seqlens_kvcache.astype(jnp.int32),
            jnp.maximum(block_ids.astype(jnp.int32), 0),
            hkv,
            tq,
            pages_per_compute_block,
            max_q_tiles,
            interpret=interpret_default(),
        )
    # Compact per-request slots back to packed rows with contiguous
    # dynamic_update_slices (ascending i: each write covers the previous
    # slot's garbage tail; the extension row absorbs the last one's).
    dv_out = o_t.shape[-1]
    o_ext = jnp.zeros((hq, total_q + max_q_pad, dv_out), o_t.dtype)
    for i in range(b):
        blk = jax.lax.dynamic_slice(
            o_t, (0, i * max_q_pad, 0), (hq, max_q_pad, dv_out)
        )
        o_ext = jax.lax.dynamic_update_slice(o_ext, blk, (0, cu[i], 0))
    out = jnp.transpose(o_ext[:, :total_q], (1, 0, 2))
    return fold_vscale(out)


def attention_with_kvcache_prefill_bf16(
    q, kcache, vcache, cu_seqlens_q, block_ids, seqlens_kvcache, max_seqlens_q, **kw
):
    """BF16 paged prefill (reference op #2)."""
    return attention_with_kvcache_prefill(
        q, kcache, vcache, cu_seqlens_q, block_ids, seqlens_kvcache, max_seqlens_q, **kw
    )


def attention_with_kvcache_prefill_fp8(
    q,
    kcache,
    vcache,
    qscale,
    kscale,
    vscale,
    cu_seqlens_q,
    block_ids,
    seqlens_kvcache,
    max_seqlens_q,
    quant_type: QuantType = QuantType.QPERTOKEN_PERHEAD_KPERTENSOR_VPERTENSOR,
    **kw,
):
    """FP8 paged prefill (reference op #3)."""
    return attention_with_kvcache_prefill(
        q,
        kcache,
        vcache,
        cu_seqlens_q,
        block_ids,
        seqlens_kvcache,
        max_seqlens_q,
        qscale=qscale,
        kscale=kscale,
        vscale=vscale,
        quant_type=quant_type,
        **kw,
    )


def attention_with_kvcache_blocksparse_prefill_fp8(
    q,
    kcache,
    vcache,
    qscale,
    kscale,
    vscale,
    cu_seqlens_q,
    block_ids,
    seqlens_kvcache,
    max_seqlens_q,
    quant_type: QuantType = QuantType.QPERTOKEN_PERHEAD_KPERTENSOR_VPERTENSOR,
    block_mask=None,
    **kw,
):
    """Unified dense/block-sparse FP8 prefill (reference op #4).

    block_mask: [B, Hq, max_tile_m, n_tile_kv] uint8 — True tiles computed,
    False tiles skipped. The caller keeps the causal diagonal tile set (rows
    with zero active tiles produce NaN, matching the reference contract).
    """
    return attention_with_kvcache_prefill(
        q,
        kcache,
        vcache,
        cu_seqlens_q,
        block_ids,
        seqlens_kvcache,
        max_seqlens_q,
        qscale=qscale,
        kscale=kscale,
        vscale=vscale,
        quant_type=quant_type,
        block_mask=block_mask,
        **kw,
    )


def attention_prefill_bf16(
    q, k, v, seqlens_q, cu_seqlens_q, max_seqlens_q, *, tq: int = 128, **kw
):
    """Dense packed-varlen prefill (reference op #1): K/V packed like Q.

    Implemented by staging packed K/V into per-request pages and running the
    paged kernel — staging is O(total_kv) against the O(total_kv * q_tiles)
    attention work.
    """
    total, hkv, d = k.shape
    dv = v.shape[-1]
    b = seqlens_q.shape[0]
    page = 128
    max_blocks = cdiv(int(max_seqlens_q), page)
    nb = b * max_blocks

    # request r, page p -> physical page r*max_blocks + p
    block_ids = (
        jnp.arange(b, dtype=jnp.int32)[:, None] * max_blocks
        + jnp.arange(max_blocks, dtype=jnp.int32)[None, :]
    )
    row = jnp.arange(total, dtype=jnp.int32)
    req = jnp.searchsorted(cu_seqlens_q[1:], row, side="right").astype(jnp.int32)
    req = jnp.minimum(req, b - 1)
    pos = row - cu_seqlens_q[req]
    valid = row < cu_seqlens_q[b]
    slot = jnp.where(valid, req * (max_blocks * page) + pos, jnp.int32(2**31 - 1))
    k_pages = (
        jnp.zeros((nb * page, hkv, d), k.dtype)
        .at[slot]
        .set(k, mode="drop")
        .reshape(nb, page, hkv, d)
    )
    v_pages = (
        jnp.zeros((nb * page, hkv, dv), v.dtype)
        .at[slot]
        .set(v, mode="drop")
        .reshape(nb, page, hkv, dv)
    )
    return attention_with_kvcache_prefill(
        q,
        k_pages,
        v_pages,
        cu_seqlens_q,
        block_ids,
        seqlens_q,
        max_seqlens_q,
        tq=tq,
        **kw,
    )


__all__ = [
    "attention_prefill_bf16",
    "attention_with_kvcache_prefill",
    "attention_with_kvcache_prefill_bf16",
    "attention_with_kvcache_prefill_fp8",
    "attention_with_kvcache_blocksparse_prefill_fp8",
]
