"""Tests for the Stem sparse-mask pipeline (reference: tests/test_stem_*.py —
the reference ships smoke tests; here we add golden math tests against a
numpy port of the kernel semantics plus the same sanity checks)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hpc_ops_tpu.ops.stem import (
    stem_oam_gemm,
    stem_oam_prep_paged_kv,
    stem_oam_prep_varlen_q,
    stem_paged_kv,
    stem_tpd,
)
from hpc_ops_tpu.utils.testing import assert_allclose

SB, ST = 128, 16  # stem block, stride


def np_kflat_vbias(k_tok, v_tok, kv_len, lambda_mag=0.3):
    """k_tok/v_tok: [T_pad, D] fp32 for one (batch, head)."""
    t_pad, d = k_tok.shape
    kb = t_pad // SB
    spb = SB // ST
    k_tok = k_tok.copy()
    v_tok = v_tok.copy()
    k_tok[kv_len:] = 0
    v_tok[kv_len:] = 0

    kflat = np.zeros((kb, ST * d), np.float32)
    for blk in range(kb):
        for g in range(ST):
            rows = [blk * SB + g + i * ST for i in range(spb)]
            s = sum(k_tok[r] for r in rows if r < kv_len)
            s = np.asarray(jnp.asarray(s, jnp.bfloat16), np.float32)
            kflat[blk, (ST - 1 - g) * d : (ST - g) * d] = s

    n_groups_total = t_pad // ST
    g_len = ((kv_len + SB - 1) // SB) * SB // ST
    vmax = np.zeros(n_groups_total, np.float32)
    for gi in range(n_groups_total):
        seg = v_tok[gi * ST : (gi + 1) * ST]
        vmax[gi] = np.linalg.norm(seg, axis=-1).max() if seg.size else 0.0
    logv = np.log(vmax[:g_len] + 1e-6)
    mean = logv.mean()
    std = np.sqrt(((logv - mean) ** 2).sum() / max(g_len - 1, 1)) if g_len > 1 else 0.0
    normalized = (np.log(vmax + 1e-6) - mean) / (std + 1e-6)
    contrib = lambda_mag * np.maximum(normalized, 0.0)
    contrib[g_len:] = 0
    vbias = contrib.reshape(kb, spb).sum(-1) / spb
    return kflat, vbias


def test_prep_paged_kv_golden():
    rng = np.random.RandomState(41)
    b, hkv, d, bs = 2, 2, 128, 64
    kv_lens = [200, 130]
    max_blocks = 4
    nb = b * max_blocks
    kcache = rng.randn(nb, bs, hkv, d).astype(np.float32) / np.sqrt(d)
    vcache = rng.randn(nb, bs, hkv, d).astype(np.float32)
    kv_idx = np.arange(nb, dtype=np.int32).reshape(b, max_blocks)

    k8 = jnp.asarray(kcache, jnp.float8_e4m3fn)
    v8 = jnp.asarray(vcache, jnp.float8_e4m3fn)
    kflat, vbias = stem_oam_prep_paged_kv(
        k8, v8,
        jnp.asarray([1.0], jnp.float32), jnp.asarray([1.0], jnp.float32),
        jnp.asarray(kv_idx), jnp.asarray(kv_lens, jnp.int32),
    )
    t_pad = max_blocks * bs  # 256 -> 2 stem blocks
    assert kflat.shape == (b, hkv, t_pad // SB, ST * d)
    assert vbias.shape == (b, hkv, t_pad // SB)

    for bi in range(b):
        for h in range(hkv):
            k_tok = np.stack(
                [
                    np.asarray(k8, np.float32)[kv_idx[bi, p // bs], p % bs, h]
                    for p in range(t_pad)
                ]
            )
            v_tok = np.stack(
                [
                    np.asarray(v8, np.float32)[kv_idx[bi, p // bs], p % bs, h]
                    for p in range(t_pad)
                ]
            )
            want_k, want_v = np_kflat_vbias(k_tok, v_tok, kv_lens[bi])
            assert_allclose(
                np.asarray(kflat, np.float32)[bi, h], want_k, atol=0.08, rtol=0.05,
                name=f"kflat b{bi} h{h}",
            )
            assert_allclose(
                np.asarray(vbias)[bi, h], want_v, atol=1e-3, rtol=1e-3,
                name=f"vbias b{bi} h{h}",
            )


def test_oam_gemm_and_causal():
    rng = np.random.RandomState(3)
    b, hq, hkv, qb, kb, f = 1, 2, 1, 3, 4, ST * 128
    qflat = jnp.asarray(rng.randn(b, hq, qb, f) / 40, jnp.bfloat16)
    kflat = jnp.asarray(rng.randn(b, hkv, kb, f) / 40, jnp.bfloat16)
    vbias = jnp.asarray(rng.rand(b, hkv, kb), jnp.float32)
    q_lens = jnp.asarray([3 * SB - 10], jnp.int32)
    kv_lens = jnp.asarray([4 * SB - 50], jnp.int32)

    logits = stem_oam_gemm(qflat, kflat, vbias, q_lens, kv_lens)
    lg = np.asarray(logits, np.float32)
    frob = 1.0 / 64
    want = (
        np.einsum(
            "bhqf,bhkf->bhqk",
            np.asarray(qflat, np.float32),
            np.repeat(np.asarray(kflat, np.float32), 2, 1),
        )
        * frob
        + np.repeat(np.asarray(vbias), 2, 1)[:, :, None, :]
    )
    off = -(-(int(kv_lens[0]) - int(q_lens[0])) // SB)  # ceil
    for q in range(qb):
        for kk in range(kb):
            if q + off < kk:
                assert lg[0, 0, q, kk] == -np.inf
            else:
                assert abs(lg[0, 0, q, kk] - want[0, 0, q, kk]) < 0.05


def test_tpd_budget_and_forced():
    rng = np.random.RandomState(9)
    b, hq, qb, kb = 1, 1, 2, 60
    kv_len = kb * SB
    q_len = qb * SB
    logits = rng.randn(b, hq, qb, kb).astype(np.float32)
    off = (kv_len - q_len) // SB
    # causal invalidation
    for q in range(qb):
        logits[0, 0, q, q + off + 1 :] = -np.inf

    mask = stem_tpd(
        jnp.asarray(logits, jnp.bfloat16),
        jnp.asarray([q_len], jnp.int32),
        jnp.asarray([kv_len], jnp.int32),
        jnp.asarray([kv_len], jnp.int32),
    )
    m = np.asarray(mask)
    assert m.shape == logits.shape
    # prompt_kv_blocks = 60 in [56, 160) -> budget = int(60*0.2)+30 = 42
    budget = int(kb * 0.2) + 30
    for q in range(qb):
        diag = min(q + off, kb - 1)
        row = m[0, 0, q]
        # forced blocks present
        assert row[:4].all()
        assert row[max(diag - 3, 0) : diag + 1].all()
        # causally-invalid blocks never selected
        assert not row[diag + 1 :].any()
        # top-k coverage: number selected >= min(budget, finite)
        finite = diag + 1
        assert row.sum() >= min(budget, finite)
        # and every selected non-forced block has logit >= kth largest
        vals = logits[0, 0, q, :finite]
        kth = np.sort(vals)[::-1][min(budget, finite) - 1]
        for c in range(finite):
            forced = c < 4 or (diag - 4 < c <= diag)
            if row[c] and not forced:
                assert vals[c] >= kth - 1e-3


def test_stem_paged_kv_e2e_sanity():
    rng = np.random.RandomState(5)
    b, hq, hkv, d, bs = 1, 2, 1, 128, 64
    seq = 512
    nb = seq // bs
    q = jnp.asarray(rng.randn(seq, hq, d) / np.sqrt(d), jnp.float8_e4m3fn)
    kcache = jnp.asarray(rng.randn(nb, bs, hkv, d) / np.sqrt(d), jnp.float8_e4m3fn)
    vcache = jnp.asarray(rng.randn(nb, bs, hkv, d), jnp.float8_e4m3fn)
    kv_idx = jnp.arange(nb, dtype=jnp.int32).reshape(1, nb)
    qscale = jnp.ones((1, hq, 512), jnp.float32)
    cu = jnp.asarray([0, seq], jnp.int32)
    lens = jnp.asarray([seq], jnp.int32)

    mask = stem_paged_kv(
        q, kcache, vcache, qscale,
        jnp.asarray([1.0], jnp.float32), jnp.asarray([1.0], jnp.float32),
        kv_idx, cu, lens, lens,
    )
    m = np.asarray(mask)
    assert m.shape == (1, hq, 4, 4)
    assert m.dtype == np.uint8
    # prompt blocks = 4 < 56 -> budget = all blocks: causal lower triangle all 1.
    # NOTE: the initial-sink force (col < initial_blocks=4) applies even above
    # the causal diagonal — matching the reference kernel
    # (stem_kernels.cuh:1233 "selected |= (col < initial_blocks)").
    for qb_i in range(4):
        assert m[0, 0, qb_i].all()


def test_stem_mask_drives_blocksparse_prefill():
    """The reference long-context pipeline (ops #22 -> #4): Stem generates a
    block mask that the sparse Pallas prefill consumes; result must match
    the oracle path under the same mask."""
    from hpc_ops_tpu.ops.attention.prefill import attention_with_kvcache_prefill

    rng = np.random.RandomState(11)
    b, hq, hkv, d, bs = 1, 2, 1, 128, 64
    seq = 1024
    nb = seq // bs
    qf = rng.randn(seq, hq, d).astype(np.float32) / np.sqrt(d)
    q8 = jnp.asarray(qf, jnp.float8_e4m3fn)
    kcache = jnp.asarray(
        rng.randn(nb, bs, hkv, d) / np.sqrt(d), jnp.float8_e4m3fn
    )
    vcache = jnp.asarray(rng.randn(nb, bs, hkv, d) / 8, jnp.float8_e4m3fn)
    kv_idx = jnp.arange(nb, dtype=jnp.int32).reshape(1, nb)
    qscale = jnp.ones((1, hq, seq), jnp.float32)
    one = jnp.asarray([1.0], jnp.float32)
    cu = jnp.asarray([0, seq], jnp.int32)
    lens = jnp.asarray([seq], jnp.int32)

    mask = stem_paged_kv(
        q8, kcache, vcache, qscale, one, one, kv_idx, cu, lens, lens,
        # force a sparse regime on this short prompt
        k_block_num_rate_medium=0.3, k_block_num_bias_medium=1,
        k_block_num_rate_large=0.2, k_block_num_bias_large=1,
        initial_blocks=1, window_size=1,
    )
    m = np.asarray(mask)
    assert m.shape == (1, hq, seq // 128, seq // 128)

    args = (q8, kcache, vcache, cu, kv_idx, lens, seq)
    kw = dict(
        qscale=qscale, kscale=one, vscale=one,
        block_mask=mask, mask_tile_q=128, mask_tile_kv=128, tq=128,
    )
    out = attention_with_kvcache_prefill(*args, **kw)
    want = attention_with_kvcache_prefill(*args, impl="ref", **kw)
    assert_allclose(
        np.asarray(out, np.float32),
        np.asarray(want, np.float32),
        atol=5e-2,
        rtol=5e-2,
        name="stem_to_sparse_prefill",
    )
