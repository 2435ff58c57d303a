"""Tests for varlen prefill attention (reference: tests/test_attention_prefill_bf16.py,
test_attention_with_kvcache_prefill_bf16.py, fp8 variants).

Tolerance note: the Pallas kernel runs softmax in the log2 domain with a
bf16 exp2 argument (prefill.py softmax_part) — logits far below the row
max carry ~|arg|*2^-8 argument-rounding error, i.e. a few % relative on
small probabilities (measured max ~2e-3 vs the f32 oracle at bf16 I/O).
The 4e-2 atol/rtol used here covers that deliberate deviation on top of
ordinary bf16 I/O rounding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpc_ops_tpu.config import QuantType
from hpc_ops_tpu.ops.attention.prefill import (
    attention_prefill_bf16,
    attention_with_kvcache_prefill,
)
from hpc_ops_tpu.utils.testing import assert_allclose


def np_varlen_attn(q, ks, vs, q_lens, kv_lens, hkv):
    """q packed [total, Hq, D]; ks/vs lists per request [kv_len, Hkv, D]."""
    hq, d = q.shape[1], q.shape[2]
    g = hq // hkv
    outs = []
    off = 0
    for bi, (ql, kl) in enumerate(zip(q_lens, kv_lens)):
        qi = q[off : off + ql]
        k, v = ks[bi], vs[bi]
        o = np.zeros((ql, hq, v.shape[-1]), np.float32)
        for h in range(hq):
            s = qi[:, h] @ k[:, h // g].T / np.sqrt(d)
            qpos = kl - ql + np.arange(ql)
            mask = np.arange(kl)[None, :] <= qpos[:, None]
            s = np.where(mask, s, -1e30)
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            o[:, h] = p @ v[:, h // g]
        outs.append(o)
        off += ql
    return np.concatenate(outs, 0)


def build_paged(ks, vs, bs, seed=0):
    """Scatter per-request K/V into a shuffled paged cache."""
    rng = np.random.RandomState(seed)
    b = len(ks)
    hkv, d = ks[0].shape[1], ks[0].shape[2]
    dv = vs[0].shape[2]
    nblocks = [(k.shape[0] + bs - 1) // bs for k in ks]
    max_blocks = max(nblocks) + 1
    total_blocks = sum(nblocks) + 3
    perm = rng.permutation(total_blocks)
    block_ids = -np.ones((b, max_blocks), np.int32)
    kcache = np.zeros((total_blocks, bs, hkv, d), np.float32)
    vcache = np.zeros((total_blocks, bs, hkv, dv), np.float32)
    off = 0
    for i in range(b):
        n = nblocks[i]
        block_ids[i, :n] = perm[off : off + n]
        off += n
        for pos in range(ks[i].shape[0]):
            blk = block_ids[i, pos // bs]
            kcache[blk, pos % bs] = ks[i][pos]
            vcache[blk, pos % bs] = vs[i][pos]
    return kcache, vcache, block_ids


@pytest.mark.parametrize(
    "q_lens,kv_extra",
    [
        ([64], [0]),  # single, aligned
        ([33, 129, 7], [0, 0, 0]),  # varlen, no history
        ([16, 40], [70, 9]),  # chunked prefill: kv history before q
    ],
)
def test_paged_prefill_bf16(q_lens, kv_extra):
    rng = np.random.RandomState(41)
    hq, hkv, d, bs = 8, 2, 128, 16
    kv_lens = [q + e for q, e in zip(q_lens, kv_extra)]
    total_q = sum(q_lens)
    q = rng.randn(total_q, hq, d).astype(np.float32)
    ks = [rng.randn(L, hkv, d).astype(np.float32) for L in kv_lens]
    vs = [rng.randn(L, hkv, d).astype(np.float32) for L in kv_lens]

    q_bf = jnp.asarray(q, jnp.bfloat16)
    q = np.asarray(q_bf, np.float32)
    ks = [np.asarray(jnp.asarray(k, jnp.bfloat16), np.float32) for k in ks]
    vs = [np.asarray(jnp.asarray(v, jnp.bfloat16), np.float32) for v in vs]

    want = np_varlen_attn(q, ks, vs, q_lens, kv_lens, hkv)

    kcache, vcache, block_ids = build_paged(ks, vs, bs)
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(q_lens)]), jnp.int32)

    out = attention_with_kvcache_prefill(
        q_bf,
        jnp.asarray(kcache, jnp.bfloat16),
        jnp.asarray(vcache, jnp.bfloat16),
        cu_q,
        jnp.asarray(block_ids),
        jnp.asarray(kv_lens, jnp.int32),
        max(q_lens),
        tq=64,
    )
    assert out.shape == (total_q, hq, d)
    assert_allclose(np.asarray(out, np.float32), want, atol=4e-2, rtol=4e-2)


def test_paged_prefill_multi_chunk_interior():
    """Small compute chunks (ck=32) against a long KV history: chunks fully
    below the q tile run the interior (mask-free) kernel branch, the
    diagonal/tail chunk runs the masked branch — both must agree with the
    numpy oracle."""
    rng = np.random.RandomState(11)
    hq, hkv, d, bs = 8, 2, 128, 16
    q_lens = [16, 40]
    kv_lens = [86, 49]
    total_q = sum(q_lens)
    q = rng.randn(total_q, hq, d).astype(np.float32)
    ks = [rng.randn(L, hkv, d).astype(np.float32) for L in kv_lens]
    vs = [rng.randn(L, hkv, d).astype(np.float32) for L in kv_lens]

    q_bf = jnp.asarray(q, jnp.bfloat16)
    q = np.asarray(q_bf, np.float32)
    ks = [np.asarray(jnp.asarray(k, jnp.bfloat16), np.float32) for k in ks]
    vs = [np.asarray(jnp.asarray(v, jnp.bfloat16), np.float32) for v in vs]
    want = np_varlen_attn(q, ks, vs, q_lens, kv_lens, hkv)

    kcache, vcache, block_ids = build_paged(ks, vs, bs)
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(q_lens)]), jnp.int32)
    out = attention_with_kvcache_prefill(
        q_bf,
        jnp.asarray(kcache, jnp.bfloat16),
        jnp.asarray(vcache, jnp.bfloat16),
        cu_q,
        jnp.asarray(block_ids),
        jnp.asarray(kv_lens, jnp.int32),
        max(q_lens),
        tq=16,
        pages_per_compute_block=2,  # ck=32 -> interior + boundary chunks
    )
    assert_allclose(np.asarray(out, np.float32), want, atol=4e-2, rtol=4e-2)


def test_dense_prefill_bf16():
    rng = np.random.RandomState(3)
    hq, hkv, d = 4, 4, 128
    q_lens = [48, 17]
    total = sum(q_lens)
    q = jnp.asarray(rng.randn(total, hq, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(total, hkv, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(total, hkv, d), jnp.bfloat16)
    cu = jnp.asarray([0, 48, 65], jnp.int32)
    out = attention_prefill_bf16(
        q, k, v, jnp.asarray(q_lens, jnp.int32), cu, max(q_lens), tq=64
    )
    qf = np.asarray(q, np.float32)
    kf = np.asarray(k, np.float32)
    vf = np.asarray(v, np.float32)
    ks = [kf[0:48], kf[48:65]]
    vs = [vf[0:48], vf[48:65]]
    want = np_varlen_attn(qf, ks, vs, q_lens, q_lens, hkv)
    assert_allclose(np.asarray(out, np.float32), want, atol=4e-2, rtol=4e-2)


def test_paged_prefill_fp8_pertensor():
    rng = np.random.RandomState(9)
    hq, hkv, d, bs = 4, 2, 128, 16
    q_lens = [40, 21]
    kv_lens = [60, 21]
    total_q = sum(q_lens)
    q = rng.randn(total_q, hq, d).astype(np.float32)
    ks = [rng.randn(L, hkv, d).astype(np.float32) for L in kv_lens]
    vs = [rng.randn(L, hkv, d).astype(np.float32) for L in kv_lens]

    kscale = max(np.abs(k).max() for k in ks) / 448.0
    vscale = max(np.abs(v).max() for v in vs) / 448.0
    ks8 = [
        np.asarray(jnp.asarray(k / kscale, jnp.float8_e4m3fn), np.float32) * kscale
        for k in ks
    ]
    vs8 = [
        np.asarray(jnp.asarray(v / vscale, jnp.float8_e4m3fn), np.float32) * vscale
        for v in vs
    ]

    # per-token-per-head q scales, padded layout [B, Hq, max_q_pad]
    max_q_pad = ((max(q_lens) + 127) // 128) * 128
    qscale = np.zeros((2, hq, max_q_pad), np.float32)
    q8 = np.zeros_like(q)
    off = 0
    for bi, ql in enumerate(q_lens):
        for p in range(ql):
            for h in range(hq):
                s = max(np.abs(q[off + p, h]).max() / 448.0, 1e-12)
                qscale[bi, h, p] = s
                q8[off + p, h] = (
                    np.asarray(
                        jnp.asarray(q[off + p, h] / s, jnp.float8_e4m3fn), np.float32
                    )
                )
        off += ql

    want = np_varlen_attn(
        np.asarray(jnp.asarray(q, jnp.bfloat16), np.float32),
        ks8,
        vs8,
        q_lens,
        kv_lens,
        hkv,
    )

    kcache, vcache, block_ids = build_paged(
        [k / kscale for k in ks], [v / vscale for v in vs], bs
    )
    cu_q = jnp.asarray([0, 40, 61], jnp.int32)

    out = attention_with_kvcache_prefill(
        jnp.asarray(q8, jnp.float8_e4m3fn),
        jnp.asarray(kcache, jnp.float8_e4m3fn),
        jnp.asarray(vcache, jnp.float8_e4m3fn),
        cu_q,
        jnp.asarray(block_ids),
        jnp.asarray(kv_lens, jnp.int32),
        max(q_lens),
        qscale=jnp.asarray(qscale),
        kscale=jnp.asarray([kscale], jnp.float32),
        vscale=jnp.asarray([vscale], jnp.float32),
        quant_type=QuantType.QPERTOKEN_PERHEAD_KPERTENSOR_VPERTENSOR,
        tq=64,
    )
    assert_allclose(np.asarray(out, np.float32), want, atol=0.15, rtol=0.1, name="fp8")


@pytest.mark.parametrize("use_mask", [False, True])
def test_paged_prefill_fp8_pertoken_k(use_mask):
    """QuantType-0 prefill fast path (per-token-per-head K scales applied to
    the logits in-kernel, per-head V scale on the output) vs the dequant
    oracle — dense and block-sparse kernels."""
    rng = np.random.RandomState(23)
    hq, hkv, d, bs = 4, 2, 128, 16
    q_lens = [128, 77]
    kv_lens = [192, 77]
    total_q = sum(q_lens)
    q = jnp.asarray(rng.randn(total_q, hq, d), jnp.bfloat16)
    ks = [rng.randn(L, hkv, d).astype(np.float32) for L in kv_lens]
    vs = [rng.randn(L, hkv, d).astype(np.float32) for L in kv_lens]

    kcache, vcache, block_ids = build_paged(ks, vs, bs)
    nb = kcache.shape[0]
    kscale = (np.abs(kcache).max(axis=-1, keepdims=True) / 448.0 + 1e-6).astype(
        np.float32
    )  # [nb, bs, hkv, 1]
    vscale = (np.abs(vcache).max(axis=(0, 1, 3)) / 448.0 + 1e-6).astype(
        np.float32
    )  # [hkv]
    kc8 = jnp.asarray(kcache / kscale, jnp.float8_e4m3fn)
    vc8 = jnp.asarray(vcache / vscale[None, None, :, None], jnp.float8_e4m3fn)
    assert np.isfinite(np.asarray(kc8, np.float32)).all()
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(q_lens)]), jnp.int32)

    kw = dict(
        qscale=None,
        kscale=jnp.asarray(kscale),
        vscale=jnp.asarray(vscale),
        quant_type=QuantType.QPERTOKEN_PERHEAD_KPERTOKEN_PERHEAD_VPERHEAD,
        tq=64,
    )
    if use_mask:
        mtq = mtkv = 64
        n_tm = (max(q_lens) + mtq - 1) // mtq
        n_tkv = (max(kv_lens) + mtkv - 1) // mtkv
        mask = (rng.rand(2, hq, n_tm, n_tkv) < 0.5).astype(np.uint8)
        for bi, (ql, kl) in enumerate(zip(q_lens, kv_lens)):
            off = kl - ql
            for t in range((ql + mtq - 1) // mtq):
                mask[bi, :, t, (off + t * mtq) // mtkv] = 1
        kw.update(
            block_mask=jnp.asarray(mask), mask_tile_q=mtq, mask_tile_kv=mtkv
        )

    args = (
        q,
        kc8,
        vc8,
        cu_q,
        jnp.asarray(block_ids),
        jnp.asarray(kv_lens, jnp.int32),
        max(q_lens),
    )
    out = attention_with_kvcache_prefill(*args, **kw)
    want = attention_with_kvcache_prefill(*args, impl="ref", **kw)
    assert_allclose(
        np.asarray(out, np.float32),
        np.asarray(want, np.float32),
        atol=4e-2,
        rtol=4e-2,
        name=f"qt0_prefill{'_sparse' if use_mask else ''}",
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_blocksparse_prefill_pallas_vs_ref(seed):
    """Sparse Pallas kernel (mask-skipped chunks) vs the oracle mask path."""
    rng = np.random.RandomState(41 + seed)
    hq, hkv, d, bs = 4, 2, 128, 16
    q_lens = [128, 77]
    kv_lens = [192, 77]
    mtq = mtkv = 64
    total_q = sum(q_lens)
    q = rng.randn(total_q, hq, d).astype(np.float32)
    ks = [rng.randn(L, hkv, d).astype(np.float32) for L in kv_lens]
    vs = [rng.randn(L, hkv, d).astype(np.float32) for L in kv_lens]

    q_bf = jnp.asarray(q, jnp.bfloat16)
    kcache, vcache, block_ids = build_paged(ks, vs, bs)
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(q_lens)]), jnp.int32)

    n_tm = (max(q_lens) + mtq - 1) // mtq
    n_tkv = (max(kv_lens) + mtkv - 1) // mtkv
    mask = (rng.rand(2, hq, n_tm, n_tkv) < 0.5).astype(np.uint8)
    # keep the causal diagonal tile of every q tile (reference contract)
    for bi, (ql, kl) in enumerate(zip(q_lens, kv_lens)):
        off = kl - ql
        for t in range((ql + mtq - 1) // mtq):
            mask[bi, :, t, (off + t * mtq) // mtkv] = 1
    block_mask = jnp.asarray(mask)

    args = (
        q_bf,
        jnp.asarray(kcache, jnp.bfloat16),
        jnp.asarray(vcache, jnp.bfloat16),
        cu_q,
        jnp.asarray(block_ids),
        jnp.asarray(kv_lens, jnp.int32),
        max(q_lens),
    )
    kw = dict(
        block_mask=block_mask, mask_tile_q=mtq, mask_tile_kv=mtkv, tq=mtq
    )
    out = attention_with_kvcache_prefill(*args, **kw)
    want = attention_with_kvcache_prefill(*args, impl="ref", **kw)
    assert_allclose(
        np.asarray(out, np.float32),
        np.asarray(want, np.float32),
        atol=4e-2,
        rtol=4e-2,
        name="sparse_pallas_vs_ref",
    )


@pytest.mark.parametrize(
    "q_lens,kv_extra",
    [
        ([64], [0]),
        ([33, 129, 7], [0, 0, 0]),
        ([16, 40], [70, 9]),  # chunked prefill: kv history before q
    ],
)
def test_paged_prefill_nhd_fused_bf16(q_lens, kv_extra):
    """All-heads NHD_FUSED prefill (slot-leading fused slab, read in place)
    matches the NHD path."""
    from hpc_ops_tpu.ops.attention.paging import nhd_to_hnd, pack_kv_fused_nhd

    rng = np.random.RandomState(43)
    hq, hkv, d, bs = 8, 2, 128, 16
    kv_lens = [q + e for q, e in zip(q_lens, kv_extra)]
    total_q = sum(q_lens)
    q = rng.randn(total_q, hq, d).astype(np.float32)
    ks = [rng.randn(L, hkv, d).astype(np.float32) for L in kv_lens]
    vs = [rng.randn(L, hkv, d).astype(np.float32) for L in kv_lens]

    q_bf = jnp.asarray(q, jnp.bfloat16)
    kcache, vcache, block_ids = build_paged(ks, vs, bs)
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(q_lens)]), jnp.int32)

    kw = dict(tq=64)
    want = attention_with_kvcache_prefill(
        q_bf,
        jnp.asarray(kcache, jnp.bfloat16),
        jnp.asarray(vcache, jnp.bfloat16),
        cu_q,
        jnp.asarray(block_ids),
        jnp.asarray(kv_lens, jnp.int32),
        max(q_lens),
        **kw,
    )
    kv_slab = pack_kv_fused_nhd(
        nhd_to_hnd(jnp.asarray(kcache, jnp.bfloat16)),
        nhd_to_hnd(jnp.asarray(vcache, jnp.bfloat16)),
    )
    out = attention_with_kvcache_prefill(
        q_bf,
        kv_slab,
        None,
        cu_q,
        jnp.asarray(block_ids),
        jnp.asarray(kv_lens, jnp.int32),
        max(q_lens),
        cache_layout="NHD_FUSED",
        **kw,
    )
    assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2, name="nhd_fused_prefill",
    )


def test_paged_prefill_nhd_fused_int8():
    """int8 fused-slab prefill with per-tensor scales matches the dequantized
    bf16 NHD path within int8 tolerance."""
    from hpc_ops_tpu.ops.attention.paging import nhd_to_hnd, pack_kv_fused_nhd

    rng = np.random.RandomState(44)
    hq, hkv, d, bs = 8, 2, 128, 16
    q_lens, kv_lens = [16, 40], [86, 49]
    total_q = sum(q_lens)
    q = rng.randn(total_q, hq, d).astype(np.float32)
    ks = [(rng.randn(L, hkv, d) * 0.3).astype(np.float32) for L in kv_lens]
    vs = [(rng.randn(L, hkv, d) * 0.3).astype(np.float32) for L in kv_lens]

    q_bf = jnp.asarray(q, jnp.bfloat16)
    kcache, vcache, block_ids = build_paged(ks, vs, bs)
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(q_lens)]), jnp.int32)

    sc = 0.02
    k8 = np.clip(np.round(kcache / sc), -127, 127).astype(np.int8)
    v8 = np.clip(np.round(vcache / sc), -127, 127).astype(np.int8)

    want = attention_with_kvcache_prefill(
        q_bf,
        jnp.asarray(k8.astype(np.float32) * sc, jnp.bfloat16),
        jnp.asarray(v8.astype(np.float32) * sc, jnp.bfloat16),
        cu_q,
        jnp.asarray(block_ids),
        jnp.asarray(kv_lens, jnp.int32),
        max(q_lens),
        tq=64,
    )
    kv_slab = pack_kv_fused_nhd(
        nhd_to_hnd(jnp.asarray(k8)), nhd_to_hnd(jnp.asarray(v8))
    )
    out = attention_with_kvcache_prefill(
        q_bf,
        kv_slab,
        None,
        cu_q,
        jnp.asarray(block_ids),
        jnp.asarray(kv_lens, jnp.int32),
        max(q_lens),
        kscale=jnp.float32(sc),
        vscale=jnp.float32(sc),
        cache_layout="NHD_FUSED",
        tq=64,
    )
    assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        atol=6e-2, rtol=6e-2, name="nhd_fused_prefill_int8",
    )


# ---------------------------------------------------------------------------
# Property sweep for the packed-out (aligned_seq_starts=True) write plumbing
# (prefill.py _prefill_kernel packed writes): end-of-array clamp, tiny
# sub-tq requests, straddler spill-forward rewrites, non-uniform 8-aligned
# lens. The slotted path sweeps arbitrary (mod-8) cu alignments.
# ---------------------------------------------------------------------------


def _run_prefill_case(q_lens, kv_extra, tq, n_tq_hint=None, aligned=False,
                      seed=7):
    rng = np.random.RandomState(seed)
    hq, hkv, d, bs = 4, 2, 128, 16
    kv_lens = [q + e for q, e in zip(q_lens, kv_extra)]
    total_q = sum(q_lens)
    q = rng.randn(total_q, hq, d).astype(np.float32)
    ks = [rng.randn(L, hkv, d).astype(np.float32) for L in kv_lens]
    vs = [rng.randn(L, hkv, d).astype(np.float32) for L in kv_lens]
    q_bf = jnp.asarray(q, jnp.bfloat16)
    q = np.asarray(q_bf, np.float32)
    ks = [np.asarray(jnp.asarray(k, jnp.bfloat16), np.float32) for k in ks]
    vs = [np.asarray(jnp.asarray(v, jnp.bfloat16), np.float32) for v in vs]
    want = np_varlen_attn(q, ks, vs, q_lens, kv_lens, hkv)
    kcache, vcache, block_ids = build_paged(ks, vs, bs, seed=seed)
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(q_lens)]), jnp.int32)
    out = attention_with_kvcache_prefill(
        q_bf,
        jnp.asarray(kcache, jnp.bfloat16),
        jnp.asarray(vcache, jnp.bfloat16),
        cu_q,
        jnp.asarray(block_ids),
        jnp.asarray(kv_lens, jnp.int32),
        max(q_lens),
        tq=tq,
        aligned_seq_starts=aligned,
    )
    assert_allclose(
        np.asarray(out, np.float32), want, atol=4e-2, rtol=4e-2,
        name=f"prefill_{'aligned' if aligned else 'slotted'}_{q_lens}",
    )


@pytest.mark.parametrize(
    "q_lens,kv_extra",
    [
        # straddler: second request shorter than the superblock; the write
        # back-off must end exactly at q_len with idempotent rewrites
        ([256, 64], [0, 0]),
        # tiny first request, long second (end clamp never engages)
        ([64, 256], [0, 0]),
        # sub-8-tile tail: 8-row fallback writes under the end clamp
        ([128, 8], [0, 0]),
        # non-tq-multiple 8-aligned lens with kv history (chunked prefill)
        ([136, 264], [64, 24]),
        # single tiny aligned request (total_q < tq -> wrapper pads)
        ([16], [0]),
        # three requests, mixed sub/super-tq, all 8-aligned
        ([8, 192, 72], [0, 32, 0]),
    ],
)
def test_packed_out_aligned_sweep(q_lens, kv_extra):
    _run_prefill_case(q_lens, kv_extra, tq=64, aligned=True)


@pytest.mark.parametrize("shift", [1, 3, 7])
def test_slotted_cu_alignment_sweep(shift):
    """Arbitrary (unaligned) cu offsets: first request length ≡ shift mod 8
    exercises every window round-down + slot-shift cancellation path."""
    _run_prefill_case([shift + 48, 64, 24], [0, 16, 0], tq=64, aligned=False)


def test_packed_out_matches_slotted():
    """The two write paths must agree bit-for-bit on an aligned batch."""
    rng = np.random.RandomState(13)
    hq, hkv, d, bs = 4, 2, 128, 16
    q_lens = [128, 64, 256]
    kv_lens = [192, 64, 280]
    total_q = sum(q_lens)
    q_bf = jnp.asarray(rng.randn(total_q, hq, d), jnp.bfloat16)
    ks = [rng.randn(L, hkv, d).astype(np.float32) for L in kv_lens]
    vs = [rng.randn(L, hkv, d).astype(np.float32) for L in kv_lens]
    kcache, vcache, block_ids = build_paged(ks, vs, bs, seed=13)
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(q_lens)]), jnp.int32)
    args = (
        jnp.asarray(kcache, jnp.bfloat16),
        jnp.asarray(vcache, jnp.bfloat16),
        cu_q,
        jnp.asarray(block_ids),
        jnp.asarray(kv_lens, jnp.int32),
        max(q_lens),
    )
    a = attention_with_kvcache_prefill(q_bf, *args, tq=64, aligned_seq_starts=True)
    b = attention_with_kvcache_prefill(q_bf, *args, tq=64, aligned_seq_starts=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
