"""Tests for fused RoPE+norm+KV-store (reference: tests/test_rope.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpc_ops_tpu.ops.rope import (
    make_cos_sin_cache,
    rope_norm_store_kv,
    rope_norm_store_kv_fp8,
)
from hpc_ops_tpu.utils.testing import assert_allclose


def np_rms(x, w, eps=1e-6):
    return x * (1.0 / np.sqrt((x**2).mean(-1, keepdims=True) + eps)) * w


def np_rope_neox(x, cs):
    h = x.shape[-1] // 2
    x1, x2 = x[..., :h], x[..., h:]
    c = cs[:, None, :h]
    s = cs[:, None, h:]
    return np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def make_case(seed, req_lens, q_lens, hq=8, hkv=2, dqk=128, dv=128, blk=16):
    """Build qkv + tables + numpy-expected rotated q / cache contents."""
    rng = np.random.RandomState(seed)
    num_req = len(req_lens)
    rows = sum(q_lens)
    qkv = rng.randn(rows, hq * dqk + hkv * dqk + hkv * dv).astype(np.float32)
    qkv_bf16 = jnp.asarray(qkv, jnp.bfloat16)
    qkv = np.asarray(qkv_bf16, np.float32)

    max_pos = max(req_lens) + 8
    cos_sin = np.asarray(make_cos_sin_cache(max_pos, dqk))

    num_seqlen = np.array(req_lens, np.int32)
    q_index = np.concatenate([[0], np.cumsum(q_lens)]).astype(np.int32)

    max_blocks = (max(req_lens) + blk - 1) // blk + 2
    total_blocks = num_req * max_blocks + 4
    perm = rng.permutation(total_blocks)
    kv_idx = -np.ones((num_req, max_blocks), np.int32)
    off = 0
    for i, L in enumerate(req_lens):
        n = (L + blk - 1) // blk
        kv_idx[i, :n] = perm[off : off + n]
        off += n

    q = qkv[:, : hq * dqk].reshape(rows, hq, dqk)
    k = qkv[:, hq * dqk : (hq + hkv) * dqk].reshape(rows, hkv, dqk)
    v = qkv[:, (hq + hkv) * dqk :].reshape(rows, hkv, dv)

    # positions per row
    pos = []
    for i in range(num_req):
        pos.extend(range(req_lens[i] - q_lens[i], req_lens[i]))
    pos = np.array(pos, np.int32)
    cs = cos_sin[pos]

    return dict(
        qkv=qkv_bf16,
        cos_sin=jnp.asarray(cos_sin),
        num_seqlen=jnp.asarray(num_seqlen),
        q_index=jnp.asarray(q_index),
        kv_idx=jnp.asarray(kv_idx),
        np_q=q,
        np_k=k,
        np_v=v,
        np_pos=pos,
        np_cs=cs,
        blk=blk,
        total_blocks=total_blocks,
        hq=hq,
        hkv=hkv,
        dqk=dqk,
        dv=dv,
        kv_idx_np=kv_idx,
        req_lens=req_lens,
        q_lens=q_lens,
    )


@pytest.mark.parametrize("policy", [0, 1, 2])
@pytest.mark.parametrize(
    "req_lens,q_lens,is_prefill",
    [
        ([33, 7, 16], [33, 7, 16], True),  # prefill
        ([34, 8, 17], [1, 1, 1], False),  # decode
        ([40, 20], [3, 3], False),  # mtp decode (draft tokens)
    ],
)
def test_rope_norm_store_kv(policy, req_lens, q_lens, is_prefill):
    c = make_case(41, req_lens, q_lens)
    hq, hkv, dqk, dv, blk = c["hq"], c["hkv"], c["dqk"], c["dv"], c["blk"]
    rng = np.random.RandomState(1)
    qw = rng.rand(dqk).astype(np.float32) + 0.5
    kw = rng.rand(dqk).astype(np.float32) + 0.5

    kcache = jnp.asarray(rng.randn(c["total_blocks"], blk, hkv, dqk), jnp.bfloat16)
    vcache = jnp.asarray(rng.randn(c["total_blocks"], blk, hkv, dv), jnp.bfloat16)

    q_out, k_new, v_new = rope_norm_store_kv(
        kcache,
        vcache,
        c["qkv"],
        c["cos_sin"],
        c["num_seqlen"],
        c["q_index"],
        c["kv_idx"],
        is_prefill,
        jnp.asarray(qw),
        jnp.asarray(kw),
        qk_norm_policy=policy,
    )

    # numpy expectation
    q, k = c["np_q"].copy(), c["np_k"].copy()
    if policy == 2:
        q, k = np_rms(q, qw), np_rms(k, kw)
    q = np_rope_neox(q, c["np_cs"])
    k = np_rope_neox(k, c["np_cs"])
    if policy == 1:
        q, k = np_rms(q, qw), np_rms(k, kw)

    assert_allclose(np.asarray(q_out, np.float32), q, atol=3e-2, rtol=3e-2, name="q")

    # check cache contents for every written token + zeroed tails
    k_new = np.asarray(k_new, np.float32)
    v_new = np.asarray(v_new, np.float32)
    tok = 0
    for ri, (L, ql) in enumerate(zip(c["req_lens"], c["q_lens"])):
        for pos in range(L - ql, L):
            cb = c["kv_idx_np"][ri, pos // blk]
            pb = pos % blk
            assert_allclose(
                k_new[cb, pb], k[tok], atol=3e-2, rtol=3e-2, name=f"kcache r{ri} p{pos}"
            )
            assert_allclose(
                v_new[cb, pb],
                c["np_v"][tok],
                atol=2e-2,
                rtol=2e-2,
                name=f"vcache r{ri} p{pos}",
            )
            tok += 1
        # tail of last block zeroed
        last = L - 1
        cb = c["kv_idx_np"][ri, last // blk]
        pb = last % blk
        if pb + 1 < blk:
            assert np.all(k_new[cb, pb + 1 :] == 0)
            assert np.all(v_new[cb, pb + 1 :] == 0)


@pytest.mark.parametrize("quant_policy", [1, 2])
@pytest.mark.parametrize("is_prefill", [True, False])
def test_rope_norm_store_kv_fp8(quant_policy, is_prefill):
    if is_prefill:
        req_lens, q_lens = [33, 16], [33, 16]
    else:
        req_lens, q_lens = [34, 17], [1, 1]
    c = make_case(7, req_lens, q_lens)
    hq, hkv, dqk, dv, blk = c["hq"], c["hkv"], c["dqk"], c["dv"], c["blk"]
    rng = np.random.RandomState(2)

    kcache = jnp.zeros((c["total_blocks"], blk, hkv, dqk), jnp.float8_e4m3fn)
    vcache = jnp.zeros((c["total_blocks"], blk, hkv, dv), jnp.float8_e4m3fn)
    k_scale = jnp.array([0.01], jnp.float32)
    v_scale = jnp.array([0.02], jnp.float32)
    q_scale_inv = jnp.array([0.5], jnp.float32)
    max_seqlens = max(q_lens)

    q_fp8, q_scale, flag, k_new, v_new = rope_norm_store_kv_fp8(
        kcache,
        vcache,
        c["qkv"],
        c["cos_sin"],
        c["num_seqlen"],
        c["q_index"],
        c["kv_idx"],
        is_prefill,
        k_scale,
        v_scale,
        quant_policy,
        max_seqlens=max_seqlens,
        q_scale_inv=q_scale_inv if quant_policy == 2 else None,
    )

    rows = sum(q_lens)
    q_want = np_rope_neox(c["np_q"], c["np_cs"])
    k_want = np_rope_neox(c["np_k"], c["np_cs"])

    assert flag.shape == (len(req_lens), hkv)
    assert np.all(np.asarray(flag) == 0)

    if quant_policy == 1:
        if is_prefill:
            pad = ((max_seqlens + 127) // 128) * 128
            assert q_scale.shape == (len(req_lens), hq, pad)
            # dequantize via per-(req, pos) scale
            scales = []
            for ri, ql in enumerate(q_lens):
                for p in range(ql):
                    scales.append(np.asarray(q_scale)[ri, :, p])
            scales = np.stack(scales)  # [rows, hq]
        else:
            assert q_scale.shape == (rows, hq)
            scales = np.asarray(q_scale)
        q_deq = np.asarray(q_fp8, np.float32) * scales[:, :, None]
    else:
        assert q_scale is None
        q_deq = np.asarray(q_fp8, np.float32) * 2.0
    assert_allclose(q_deq, q_want, atol=0.15, rtol=0.06, name="q_fp8_dequant")

    # K/V cache dequant check
    k_new = np.asarray(k_new, np.float32) * 0.01
    v_new = np.asarray(v_new, np.float32) * 0.02
    tok = 0
    for ri, (L, ql) in enumerate(zip(req_lens, q_lens)):
        for pos in range(L - ql, L):
            cb = c["kv_idx_np"][ri, pos // blk]
            pb = pos % blk
            assert_allclose(
                k_new[cb, pb], k_want[tok], atol=0.2, rtol=0.1, name="kcache_fp8"
            )
            assert_allclose(
                v_new[cb, pb], c["np_v"][tok], atol=0.2, rtol=0.1, name="vcache_fp8"
            )
            tok += 1


@pytest.mark.parametrize("policy", [0, 1, 2])
@pytest.mark.parametrize("layout", ["NHD", "HND"])
@pytest.mark.parametrize(
    "req_lens,q_lens",
    [
        ([34, 8, 17, 21, 40, 12, 9, 30], [1] * 8),  # decode, rows=8
        ([33, 7, 16, 8], [33, 7, 16, 8]),  # prefill, rows=64
        ([40, 20], [4, 4]),  # mtp decode (draft tokens), rows=8
    ],
)
def test_rope_store_pallas_matches_xla(policy, layout, req_lens, q_lens):
    """Fused Pallas store kernel (ops/rope_kernel.py) vs the XLA path.

    Kernel contract: every qkv row is a real token and the row count tiles
    (see can_use_rope_kernel); cases here are sized accordingly.
    """
    c = make_case(17, req_lens, q_lens)
    hq, hkv, dqk, dv, blk = c["hq"], c["hkv"], c["dqk"], c["dv"], c["blk"]
    rng = np.random.RandomState(3)
    qw = jnp.asarray(rng.rand(dqk).astype(np.float32) + 0.5)
    kw = jnp.asarray(rng.rand(dqk).astype(np.float32) + 0.5)

    if layout == "HND":
        kshape = (hkv, c["total_blocks"], blk, dqk)
        vshape = (hkv, c["total_blocks"], blk, dv)
    else:
        kshape = (c["total_blocks"], blk, hkv, dqk)
        vshape = (c["total_blocks"], blk, hkv, dv)
    kcache = jnp.asarray(rng.randn(*kshape), jnp.bfloat16)
    vcache = jnp.asarray(rng.randn(*vshape), jnp.bfloat16)

    outs = {}
    for impl in ("xla", "pallas"):
        outs[impl] = rope_norm_store_kv(
            kcache,
            vcache,
            c["qkv"],
            c["cos_sin"],
            c["num_seqlen"],
            c["q_index"],
            c["kv_idx"],
            len(req_lens) == sum(q_lens),
            qw,
            kw,
            qk_norm_policy=policy,
            cache_layout=layout,
            impl=impl,
        )

    from hpc_ops_tpu.ops.rope import can_use_rope_kernel

    assert can_use_rope_kernel(
        c["qkv"].shape[0], kcache.dtype, c["qkv"].dtype, layout, True
    )
    for name, a, b in zip("q k v".split(), outs["pallas"], outs["xla"]):
        assert_allclose(
            np.asarray(a, np.float32),
            np.asarray(b, np.float32),
            atol=2e-2,
            rtol=2e-2,
            name=f"pallas_vs_xla_{name}",
        )


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize(
    "req_lens,q_lens",
    [
        ([34, 8, 17, 21, 40, 12, 9, 30], [1] * 8),  # decode, rows=8
        ([33, 7, 16, 8], [33, 7, 16, 8]),  # prefill, rows=64
    ],
)
def test_rope_norm_store_kv_int8_fused(impl, req_lens, q_lens):
    """int8 fused-layout store: numpy-golden codes + both impls agree.

    Cache is the serving FUSED page layout [Hkv, nb, 2*bs, D] (rows [0:bs]
    = K, [bs:2bs] = V of the page); codes follow scaled_int8_quant
    (clip(round(x/s), +-127)).
    """
    from hpc_ops_tpu.ops.rope import rope_norm_store_kv_int8

    c = make_case(23, req_lens, q_lens)
    hq, hkv, dqk, dv, blk = c["hq"], c["hkv"], c["dqk"], c["dv"], c["blk"]
    rng = np.random.RandomState(5)
    kw_ = jnp.asarray(rng.rand(dqk).astype(np.float32) + 0.5)
    qw_ = jnp.asarray(rng.rand(dqk).astype(np.float32) + 0.5)
    k_scale = jnp.array([0.011], jnp.float32)
    v_scale = jnp.array([0.017], jnp.float32)
    kv_cache = jnp.asarray(
        rng.randint(-5, 5, (hkv, c["total_blocks"], 2 * blk, dqk)), jnp.int8
    )

    q_out, kv_new = rope_norm_store_kv_int8(
        kv_cache,
        c["qkv"],
        c["cos_sin"],
        c["num_seqlen"],
        c["q_index"],
        c["kv_idx"],
        len(req_lens) == sum(q_lens),
        k_scale,
        v_scale,
        q_norm_weight=qw_,
        k_norm_weight=kw_,
        qk_norm_policy=1,
        impl=impl,
    )

    # numpy expectation
    q = np_rope_neox(c["np_q"].copy(), c["np_cs"])
    k = np_rope_neox(c["np_k"].copy(), c["np_cs"])
    q = np_rms(q, np.asarray(qw_))
    k = np_rms(k, np.asarray(kw_))
    k_codes = np.clip(np.round(k / 0.011), -127, 127)
    v_codes = np.clip(np.round(c["np_v"] / 0.017), -127, 127)

    assert q_out.dtype == jnp.bfloat16 and kv_new.dtype == jnp.int8
    assert_allclose(np.asarray(q_out, np.float32), q, atol=3e-2, rtol=3e-2, name="q")

    kv_new = np.asarray(kv_new, np.int32)
    tok = 0
    for ri, (L, ql) in enumerate(zip(c["req_lens"], c["q_lens"])):
        for pos in range(L - ql, L):
            cb = c["kv_idx_np"][ri, pos // blk]
            pb = pos % blk
            # bf16 rounding before quant can move a code by 1
            assert np.max(np.abs(kv_new[:, cb, pb] - k_codes[tok])) <= 1, (
                f"k codes r{ri} p{pos}"
            )
            assert np.max(np.abs(kv_new[:, cb, blk + pb] - v_codes[tok])) <= 1, (
                f"v codes r{ri} p{pos}"
            )
            tok += 1
    # untouched pages pass through bit-exactly
    touched = set()
    for ri, (L, ql) in enumerate(zip(c["req_lens"], c["q_lens"])):
        for pos in range(L - ql, L):
            touched.add(int(c["kv_idx_np"][ri, pos // blk]))
    for pg in range(c["total_blocks"]):
        if pg not in touched:
            assert np.array_equal(kv_new[:, pg], np.asarray(kv_cache, np.int32)[:, pg])


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_rope_norm_store_kv_int8_nhd_fused(impl):
    """NHD_FUSED (slot-leading [nb, 2bs, Hkv*D]) store matches the
    head-major FUSED store repacked — both impls."""
    from hpc_ops_tpu.ops.attention.paging import (
        pack_kv_fused_nhd,
        unpack_kv_fused,
    )
    from hpc_ops_tpu.ops.rope import rope_norm_store_kv_int8

    req_lens = [34, 8, 17, 21, 40, 12, 9, 30]
    c = make_case(29, req_lens, [1] * 8)
    hkv, dqk, blk = c["hkv"], c["dqk"], c["blk"]
    k_scale = jnp.array([0.011], jnp.float32)
    v_scale = jnp.array([0.017], jnp.float32)
    rng = np.random.RandomState(6)
    kv_cache = jnp.asarray(
        rng.randint(-5, 5, (hkv, c["total_blocks"], 2 * blk, dqk)), jnp.int8
    )
    kv_cache_nhd = pack_kv_fused_nhd(*unpack_kv_fused(kv_cache))

    common = dict(
        k_scale=k_scale, v_scale=v_scale, qk_norm_policy=0, impl=impl,
    )
    q_hm, kv_hm = rope_norm_store_kv_int8(
        kv_cache, c["qkv"], c["cos_sin"], c["num_seqlen"], c["q_index"],
        c["kv_idx"], False, **common,
    )
    q_nhd, kv_nhd = rope_norm_store_kv_int8(
        kv_cache_nhd, c["qkv"], c["cos_sin"], c["num_seqlen"], c["q_index"],
        c["kv_idx"], False, cache_layout="NHD_FUSED", num_kv_heads=hkv,
        **common,
    )
    assert kv_nhd.shape == kv_cache_nhd.shape
    np.testing.assert_array_equal(np.asarray(q_nhd), np.asarray(q_hm))
    np.testing.assert_array_equal(
        np.asarray(kv_nhd),
        np.asarray(pack_kv_fused_nhd(*unpack_kv_fused(kv_hm))),
    )


def test_rope_int8_store_feeds_fused_decode():
    """e2e: int8 fused store -> attention_decode(cache_layout="FUSED")
    matches a bf16-cache decode within int8 quantization tolerance."""
    from hpc_ops_tpu.ops.attention.decode import attention_decode
    from hpc_ops_tpu.ops.rope import rope_norm_store_kv_int8

    req_lens = [34, 8, 17, 21, 40, 12, 9, 30]
    q_lens = [1] * 8
    c = make_case(29, req_lens, q_lens, hq=8, hkv=2, blk=16)
    hq, hkv, dqk, dv, blk = c["hq"], c["hkv"], c["dqk"], c["dv"], c["blk"]
    rng = np.random.RandomState(11)
    k_scale = jnp.array([0.02], jnp.float32)
    v_scale = jnp.array([0.02], jnp.float32)
    kv_cache = jnp.asarray(
        np.clip(rng.randn(hkv, c["total_blocks"], 2 * blk, dqk) * 25, -127, 127),
        jnp.int8,
    )

    q_out, kv_new = rope_norm_store_kv_int8(
        kv_cache, c["qkv"], c["cos_sin"], c["num_seqlen"], c["q_index"],
        c["kv_idx"], False, k_scale, v_scale, impl="pallas",
    )
    out_i8 = attention_decode(
        q_out, kv_new, None, c["kv_idx"], c["num_seqlen"],
        new_kv_included=True, cache_layout="FUSED",
        kscale=k_scale, vscale=v_scale,
    )

    # bf16 oracle: dequantized HND caches + the bf16 HND decode path
    kv_np = np.asarray(kv_new, np.float32)
    k_hnd = jnp.asarray(kv_np[:, :, :blk] * 0.02, jnp.bfloat16)
    v_hnd = jnp.asarray(kv_np[:, :, blk:] * 0.02, jnp.bfloat16)
    out_ref = attention_decode(
        q_out, k_hnd, v_hnd, c["kv_idx"], c["num_seqlen"],
        new_kv_included=True, cache_layout="HND",
    )
    assert_allclose(
        np.asarray(out_i8, np.float32),
        np.asarray(out_ref, np.float32),
        atol=5e-2,
        rtol=5e-2,
        name="fused_int8_decode",
    )
