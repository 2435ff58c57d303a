"""Tests for paged decode attention (reference: tests/test_attention_decode_bf16.py
and the fp8 decode tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpc_ops_tpu.config import QuantType
from hpc_ops_tpu.ops.attention import attention_decode, attention_decode_ref
from hpc_ops_tpu.utils.testing import assert_allclose


def np_decode_ref(q, kcache, vcache, block_ids, kv_lens, sq):
    """Dense numpy decode reference (fp32)."""
    b = kv_lens.shape[0]
    hq, d = q.shape[1], q.shape[2]
    nb, bs, hkv, _ = kcache.shape
    dv = vcache.shape[-1]
    g = hq // hkv
    q = np.asarray(q, np.float32).reshape(b, sq, hq, d)
    out = np.zeros((b, sq, hq, dv), np.float32)
    for bi in range(b):
        L = int(kv_lens[bi])
        k = np.zeros((L, hkv, d), np.float32)
        v = np.zeros((L, hkv, dv), np.float32)
        for pos in range(L):
            blk = block_ids[bi, pos // bs]
            k[pos] = kcache[blk, pos % bs]
            v[pos] = vcache[blk, pos % bs]
        for s in range(sq):
            qpos = L - sq + s
            for h in range(hq):
                kk = k[: qpos + 1, h // g]
                vv = v[: qpos + 1, h // g]
                logits = kk @ q[bi, s, h] / np.sqrt(d)
                p = np.exp(logits - logits.max())
                p /= p.sum()
                out[bi, s, h] = p @ vv
    return out.reshape(b * sq, hq, dv)


def make_decode_case(seed, kv_lens, hq=8, hkv=2, d=128, bs=16, sq=1, dtype=jnp.bfloat16):
    rng = np.random.RandomState(seed)
    b = len(kv_lens)
    max_blocks = (max(kv_lens) + bs - 1) // bs + 1
    total_blocks = b * max_blocks + 3
    perm = rng.permutation(total_blocks)
    block_ids = -np.ones((b, max_blocks), np.int32)
    off = 0
    for i, L in enumerate(kv_lens):
        n = (L + bs - 1) // bs
        block_ids[i, :n] = perm[off : off + n]
        off += n

    kcache = np.zeros((total_blocks, bs, hkv, d), np.float32)
    vcache = np.zeros((total_blocks, bs, hkv, d), np.float32)
    for i, L in enumerate(kv_lens):
        for pos in range(L):
            blk = block_ids[i, pos // bs]
            kcache[blk, pos % bs] = rng.randn(hkv, d)
            vcache[blk, pos % bs] = rng.randn(hkv, d)

    q = rng.randn(b * sq, hq, d).astype(np.float32)
    q_bf = jnp.asarray(q, dtype)
    kc = jnp.asarray(kcache, dtype)
    vc = jnp.asarray(vcache, dtype)
    return q_bf, kc, vc, jnp.asarray(block_ids), np.array(kv_lens, np.int32)


@pytest.mark.parametrize(
    "kv_lens,mtp",
    [
        ([33], 0),
        ([128, 17, 255, 64], 0),
        ([40, 300], 2),
        ([16, 16, 16, 16, 16, 16, 16, 16], 0),
    ],
)
def test_attention_decode_bf16(kv_lens, mtp):
    sq = mtp + 1
    q, kc, vc, block_ids, kv_lens_np = make_decode_case(41, kv_lens, sq=sq)

    want = np_decode_ref(
        np.asarray(q, np.float32),
        np.asarray(kc, np.float32),
        np.asarray(vc, np.float32),
        np.asarray(block_ids),
        kv_lens_np,
        sq,
    )

    out = attention_decode(
        q, kc, vc, block_ids, jnp.asarray(kv_lens_np), mtp=mtp, new_kv_included=True
    )
    assert out.shape == q.shape
    assert_allclose(np.asarray(out, np.float32), want, atol=3e-2, rtol=3e-2, name="pallas")

    ref = attention_decode_ref(
        q, kc, vc, block_ids, jnp.asarray(kv_lens_np), mtp=mtp, new_kv_included=True
    )
    assert_allclose(np.asarray(ref, np.float32), want, atol=3e-2, rtol=3e-2, name="jnp_ref")


def test_attention_decode_new_kv_not_included():
    """new_kv_included=False: effective KV length is num_seq_kvcache + sq."""
    q, kc, vc, block_ids, kv_lens_np = make_decode_case(11, [64, 33], sq=1)
    out_a = attention_decode(
        q, kc, vc, block_ids, jnp.asarray(kv_lens_np), new_kv_included=True
    )
    out_b = attention_decode(
        q, kc, vc, block_ids, jnp.asarray(kv_lens_np - 1), new_kv_included=False
    )
    assert_allclose(
        np.asarray(out_a, np.float32), np.asarray(out_b, np.float32), atol=1e-6
    )


@pytest.mark.parametrize("quant_type", [
    QuantType.QPERTOKEN_PERHEAD_KPERTENSOR_VPERTENSOR,
    QuantType.QPERTENSOR_KPERTENSOR_VPERTENSOR,
])
def test_attention_decode_fp8_pertensor(quant_type):
    kv_lens = [100, 37]
    q, kc, vc, block_ids, kv_lens_np = make_decode_case(5, kv_lens, sq=1)
    b, hq = len(kv_lens), q.shape[1]

    want = np_decode_ref(
        np.asarray(q, np.float32),
        np.asarray(kc, np.float32),
        np.asarray(vc, np.float32),
        np.asarray(block_ids),
        kv_lens_np,
        1,
    )

    # quantize caches per-tensor, q per-token-per-head
    kscale = jnp.array([float(jnp.max(jnp.abs(kc.astype(jnp.float32)))) / 448.0], jnp.float32)
    vscale = jnp.array([float(jnp.max(jnp.abs(vc.astype(jnp.float32)))) / 448.0], jnp.float32)
    kc8 = (kc.astype(jnp.float32) / kscale).astype(jnp.float8_e4m3fn)
    vc8 = (vc.astype(jnp.float32) / vscale).astype(jnp.float8_e4m3fn)

    qf = q.astype(jnp.float32)
    qscale = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1) / 448.0, 1e-12)  # [B, Hq]
    q8 = (qf / qscale[..., None]).astype(jnp.float8_e4m3fn)

    out = attention_decode(
        q8.astype(jnp.bfloat16),  # kernel takes dequant-ready q; scales passed below
        kc8,
        vc8,
        block_ids,
        jnp.asarray(kv_lens_np),
        new_kv_included=True,
        qscale=qscale,
        kscale=kscale,
        vscale=vscale,
        quant_type=quant_type,
    )
    assert_allclose(np.asarray(out, np.float32), want, atol=0.12, rtol=0.08, name="fp8")


@pytest.mark.parametrize("s_groups", [1, 4])
def test_attention_decode_fp8_pertoken_k(s_groups):
    """QuantType-0: per-token-per-head K scales (scale pages DMA'd with KV),
    per-head V scale — Pallas kernel vs the dequant oracle."""
    rng = np.random.RandomState(17)
    b, hkv, g, d, bs = 3, 2, 4, 128, 16
    hq = hkv * g
    kv_lens_np = np.array([40, 16, 64], np.int64)
    max_blocks = int(np.max((kv_lens_np + bs - 1) // bs))
    nb = b * max_blocks + 2

    q = jnp.asarray(rng.randn(b, hq, d), jnp.bfloat16)
    kf = rng.randn(nb, bs, hkv, d).astype(np.float32)
    vf = rng.randn(nb, bs, hkv, d).astype(np.float32)
    # proper quantization scales: max|.|/448 per (token, head[, d-group])
    kg = kf.reshape(nb, bs, hkv, s_groups, d // s_groups)
    kscale = (np.abs(kg).max(axis=-1) / 448.0 + 1e-6).astype(np.float32)
    vscale = (
        np.abs(vf).max(axis=(0, 1, 3)) / 448.0 + 1e-6
    ).astype(np.float32)
    ks_rep = np.repeat(kscale, d // s_groups, axis=-1)
    kc8 = jnp.asarray(kf / ks_rep, jnp.float8_e4m3fn)
    vc8 = jnp.asarray(vf / vscale[None, None, :, None], jnp.float8_e4m3fn)
    assert np.isfinite(np.asarray(kc8, np.float32)).all()

    perm = rng.permutation(nb)
    block_ids = np.stack(
        [perm[i * max_blocks : (i + 1) * max_blocks] for i in range(b)]
    ).astype(np.int32)

    args = (
        q, kc8, vc8, jnp.asarray(block_ids), jnp.asarray(kv_lens_np, jnp.int32)
    )
    kw = dict(
        new_kv_included=True,
        qscale=None,
        kscale=jnp.asarray(kscale),
        vscale=jnp.asarray(vscale),
        quant_type=QuantType.QPERTOKEN_PERHEAD_KPERTOKEN_PERHEAD_VPERHEAD,
    )
    out = attention_decode(*args, **kw)
    want = attention_decode(*args, impl="ref", **kw)
    assert_allclose(
        np.asarray(out, np.float32),
        np.asarray(want, np.float32),
        atol=4e-2,
        rtol=4e-2,
        name="qt0_pallas_vs_ref",
    )


@pytest.mark.parametrize(
    "kv_lens,mtp",
    [
        ([33], 0),  # r_pack=2 packed kernel
        ([128, 17, 255, 64], 0),  # r_pack=8 packed kernel
        ([40, 300], 2),  # packed + draft rows
        ([1100, 40], 0),  # long KV -> unpacked fused kernel
    ],
)
def test_attention_decode_fused_layout_bf16(kv_lens, mtp):
    """FUSED cache layout (K|V per page in one slab) matches the NHD path."""
    from hpc_ops_tpu.ops.attention.paging import nhd_to_hnd, pack_kv_fused

    sq = mtp + 1
    q, kc, vc, block_ids, kv_lens_np = make_decode_case(17, kv_lens, sq=sq)
    want = attention_decode(
        q, kc, vc, block_ids, jnp.asarray(kv_lens_np), mtp=mtp, new_kv_included=True
    )
    kv_fused = pack_kv_fused(nhd_to_hnd(kc), nhd_to_hnd(vc))
    out = attention_decode(
        q, kv_fused, None, block_ids, jnp.asarray(kv_lens_np), mtp=mtp,
        new_kv_included=True, cache_layout="FUSED",
    )
    assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2, name="fused_vs_hnd",
    )


def test_attention_decode_fused_int8():
    """int8 fused cache: quantize_kv_fused_int8 -> decode matches fp32 oracle
    within int8 tolerance."""
    from hpc_ops_tpu.ops.attention.paging import nhd_to_hnd
    from hpc_ops_tpu.ops.quant import quantize_kv_fused_int8

    kv_lens = [100, 37, 260]
    q, kc, vc, block_ids, kv_lens_np = make_decode_case(7, kv_lens, sq=1)
    want = np_decode_ref(
        np.asarray(q, np.float32),
        np.asarray(kc, np.float32),
        np.asarray(vc, np.float32),
        np.asarray(block_ids),
        kv_lens_np,
        1,
    )
    kv_i8, ks, vs = quantize_kv_fused_int8(nhd_to_hnd(kc), nhd_to_hnd(vc))
    out = attention_decode(
        q, kv_i8, None, block_ids, jnp.asarray(kv_lens_np),
        new_kv_included=True, cache_layout="FUSED", kscale=ks, vscale=vs,
    )
    # int8 KV with per-tensor scales: ~2 decimal digits
    assert_allclose(np.asarray(out, np.float32), want, atol=8e-2, rtol=8e-2,
                    name="fused_int8")


@pytest.mark.parametrize(
    "kv_lens,mtp",
    [
        ([33], 0),
        ([128, 17, 255, 64], 0),
        ([40, 300], 2),  # draft rows
        ([1100, 40], 0),  # multi-chunk fori path
    ],
)
def test_attention_decode_nhd_fused_layout_bf16(kv_lens, mtp):
    """NHD_FUSED (slot-leading, all heads per page slab) matches NHD."""
    from hpc_ops_tpu.ops.attention.paging import nhd_to_hnd, pack_kv_fused_nhd

    sq = mtp + 1
    q, kc, vc, block_ids, kv_lens_np = make_decode_case(23, kv_lens, sq=sq)
    want = attention_decode(
        q, kc, vc, block_ids, jnp.asarray(kv_lens_np), mtp=mtp, new_kv_included=True
    )
    kv_fused = pack_kv_fused_nhd(nhd_to_hnd(kc), nhd_to_hnd(vc))
    out = attention_decode(
        q, kv_fused, None, block_ids, jnp.asarray(kv_lens_np), mtp=mtp,
        new_kv_included=True, cache_layout="NHD_FUSED",
    )
    assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2, name="nhd_fused_vs_nhd",
    )


def test_attention_decode_nhd_fused_int8():
    """int8 NHD_FUSED cache matches the fp32 oracle within int8 tolerance."""
    from hpc_ops_tpu.ops.attention.paging import (
        nhd_to_hnd,
        pack_kv_fused_nhd,
        unpack_kv_fused,
    )
    from hpc_ops_tpu.ops.quant import quantize_kv_fused_int8

    kv_lens = [100, 37, 260]
    q, kc, vc, block_ids, kv_lens_np = make_decode_case(7, kv_lens, sq=1)
    want = np_decode_ref(
        np.asarray(q, np.float32),
        np.asarray(kc, np.float32),
        np.asarray(vc, np.float32),
        np.asarray(block_ids),
        kv_lens_np,
        1,
    )
    kv_i8, ks, vs = quantize_kv_fused_int8(nhd_to_hnd(kc), nhd_to_hnd(vc))
    kv_i8_nhd = pack_kv_fused_nhd(*unpack_kv_fused(kv_i8))
    out = attention_decode(
        q, kv_i8_nhd, None, block_ids, jnp.asarray(kv_lens_np),
        new_kv_included=True, cache_layout="NHD_FUSED", kscale=ks, vscale=vs,
    )
    assert_allclose(np.asarray(out, np.float32), want, atol=8e-2, rtol=8e-2,
                    name="nhd_fused_int8")


def test_attention_decode_fp8_tailrow_kscale():
    """Reference serving-layout parity: per-token K scales packed into the
    tail rows of the cache pages (hpc/attention.py:458-462; packing per
    tests/test_attention_decode_qkpertoken_perhead_vperhead_fp8.py:14-37)
    must decode identically to the separate-scale-array path."""
    rng = np.random.RandomState(23)
    b, hkv, g, d, bs = 3, 2, 4, 128, 32
    hq = hkv * g
    sr = bs * 4 // d  # scale rows per page
    kv_lens_np = np.array([40, 16, 64], np.int64)
    max_blocks = int(np.max((kv_lens_np + bs - 1) // bs))
    nb = b * max_blocks + 2

    q = jnp.asarray(rng.randn(b, hq, d), jnp.bfloat16)
    kf = rng.randn(nb, bs, hkv, d).astype(np.float32)
    vf = rng.randn(nb, bs, hkv, d).astype(np.float32)
    kscale = (np.abs(kf).max(axis=-1) / 448.0 + 1e-6).astype(np.float32)
    vscale = (np.abs(vf).max(axis=(0, 1, 3)) / 448.0 + 1e-6).astype(np.float32)
    kc8 = (kf / kscale[..., None]).astype(np.float32)
    vc8 = vf / vscale[None, None, :, None]

    # pack: scale [nb, bs, H] -> [nb, H, bs] f32 -> bytes -> [nb, sr, H, D]
    tail = (
        np.ascontiguousarray(kscale.transpose(0, 2, 1))
        .view(np.uint8)
        .reshape(nb, hkv, sr, d)
        .transpose(0, 2, 1, 3)
    )
    k_pages = np.zeros((nb, bs + sr, hkv, d), np.uint8)
    k_pages[:, :bs] = np.asarray(
        jnp.asarray(kc8, jnp.float8_e4m3fn)
    ).view(np.uint8)
    k_pages[:, bs:] = tail
    # upload as int8 BYTES: fp8-typed transfers canonicalize NaN bit
    # patterns (0xff -> 0x7f), corrupting the raw f32 scale bytes in the
    # tail rows (see unpack_tailrow_kscale docstring)
    k_pages8 = jnp.asarray(k_pages.view(np.int8))
    v_pages8 = jnp.asarray(
        np.asarray(
            jnp.asarray(
                np.concatenate(
                    [vc8, np.zeros((nb, sr, hkv, d), np.float32)], axis=1
                ),
                jnp.float8_e4m3fn,
            )
        ).view(np.int8)
    )

    perm = rng.permutation(nb)
    block_ids = np.stack(
        [perm[i * max_blocks : (i + 1) * max_blocks] for i in range(b)]
    ).astype(np.int32)

    kw = dict(
        new_kv_included=True,
        qscale=None,
        vscale=jnp.asarray(vscale),
        quant_type=QuantType.QPERTOKEN_PERHEAD_KPERTOKEN_PERHEAD_VPERHEAD,
    )
    out_tail = attention_decode(
        q, k_pages8, v_pages8, jnp.asarray(block_ids),
        jnp.asarray(kv_lens_np, jnp.int32),
        kscale=k_pages8[:, bs:], **kw,
    )
    out_sep = attention_decode(
        q, jnp.asarray(kc8, jnp.float8_e4m3fn)[: nb],
        jnp.asarray(vc8, jnp.float8_e4m3fn), jnp.asarray(block_ids),
        jnp.asarray(kv_lens_np, jnp.int32),
        kscale=jnp.asarray(kscale[..., None]), **kw,
    )
    assert_allclose(
        np.asarray(out_tail, np.float32),
        np.asarray(out_sep, np.float32),
        atol=2e-2, rtol=2e-2, name="tailrow_vs_separate",
    )
