"""Pure-jnp reference attention — the oracle for every fast path.

Covers the reference's full attention surface (SURVEY.md §2.3 #1-#6):
varlen dense prefill, paged-cache prefill, FP8 scale schemes
(QuantType 0/1/2), block-sparse tile masks, and paged decode with draft
tokens (MTP). All math in fp32. These functions double as the "fake"
shape-inference implementations (the analog of the reference's
torch.library.register_fake) and the golden reference in tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from hpc_ops_tpu.config import QuantType

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _dequant_kv(
    kcache,
    vcache,
    kscale,
    vscale,
    quant_type: QuantType,
):
    """Dequantize paged K/V caches to fp32 given the QuantType scale scheme.

    Shapes: kcache/vcache [num_blocks, block_size, H_kv, D].
      - K/V per-tensor (quant_type 1, 2): kscale/vscale are [1].
      - Q/K per-token-per-head, V per-head (quant_type 0):
        kscale [num_blocks, bs, H_kv, num_dim_scale] broadcast over D groups,
        vscale [H_kv].
    """
    k = kcache.astype(jnp.float32)
    v = vcache.astype(jnp.float32)
    if kcache.dtype == jnp.bfloat16:
        return k, v
    qt = QuantType(quant_type)
    if qt in (
        QuantType.QPERTOKEN_PERHEAD_KPERTENSOR_VPERTENSOR,
        QuantType.QPERTENSOR_KPERTENSOR_VPERTENSOR,
    ):
        k = k * kscale.reshape(()).astype(jnp.float32)
        v = v * vscale.reshape(()).astype(jnp.float32)
    else:  # per-token-per-head K, per-head V
        ks = kscale.astype(jnp.float32)
        # kscale last dim may be 1 (one scale per token-head) or D//g groups
        d = k.shape[-1]
        reps = d // ks.shape[-1]
        ks = jnp.repeat(ks, reps, axis=-1)
        k = k * ks
        v = v * vscale.astype(jnp.float32)[None, None, :, None]
    return k, v


def _gather_pages(cache, block_ids, max_len):
    """[num_blocks, bs, H, D] + [B, max_blocks] -> [B, max_len, H, D] (fp32)."""
    bs = cache.shape[1]
    nblk = -(-max_len // bs)
    ids = block_ids[:, :nblk]
    safe = jnp.maximum(ids, 0)
    out = cache[safe]  # [B, nblk, bs, H, D]
    out = jnp.where((ids < 0)[:, :, None, None, None], 0, out)
    b = block_ids.shape[0]
    return out.reshape(b, nblk * bs, *cache.shape[2:])[:, :max_len]


def mha_varlen_prefill_ref(
    q,  # [total_q, Hq, D]
    k,  # [B, max_kv, Hkv, D] fp32 (already gathered/dequantized) or [total_q,...]
    v,
    seqlens_q,  # [B]
    cu_seqlens_q,  # [B+1]
    seqlens_kv,  # [B] total kv length (>= seqlens_q; causal offset = kv - q)
    q_scale=None,  # [B, Hq, max_q_pad] or None
    block_mask=None,  # [B, Hq, max_tile_m, n_tile_kv] bool/uint8 or None
    mask_tile_q: int = 128,
    mask_tile_kv: int = 128,
    sm_scale: Optional[float] = None,
    causal: bool = True,
):
    """Varlen causal attention over per-batch KV arrays; returns [total_q, Hq, Dv].

    The causal alignment matches the reference: query i of request b sits at
    absolute position ``seqlens_kv[b] - seqlens_q[b] + i``.
    If block_mask is given, tile (tq, tkv) of request/head is only attended
    where mask is nonzero (the reference's block-sparse semantics, NaN if a
    row has no active tiles).
    """
    total_q, hq, d = q.shape
    b, max_kv, hkv, _ = k.shape
    dv = v.shape[-1]
    g = hq // hkv
    scale = (1.0 / jnp.sqrt(d)) if sm_scale is None else sm_scale

    qf = q.astype(jnp.float32)
    out = jnp.zeros((total_q, hq, dv), jnp.float32)

    # dense per-request loop (reference oracle: clarity over speed)
    for bi in range(b):
        q_start = int(cu_seqlens_q[bi])
        q_len = int(seqlens_q[bi])
        kv_len = int(seqlens_kv[bi])
        if q_len == 0:
            continue
        qi = qf[q_start : q_start + q_len]  # [q_len, Hq, D]
        if q_scale is not None:
            qi = qi * q_scale[bi, :, :q_len].T[:, :, None]
        ki = k[bi, :kv_len]  # [kv_len, Hkv, D]
        vi = v[bi, :kv_len]
        # expand kv heads for GQA
        ki = jnp.repeat(ki, g, axis=1)  # [kv_len, Hq, D]
        vi = jnp.repeat(vi, g, axis=1)
        s = jnp.einsum("qhd,khd->hqk", qi, ki) * scale
        if causal:
            qpos = kv_len - q_len + jnp.arange(q_len)
            kpos = jnp.arange(kv_len)
            cm = kpos[None, :] <= qpos[:, None]
            s = jnp.where(cm[None], s, MASK_VALUE)
        if block_mask is not None:
            tq = jnp.arange(q_len) // mask_tile_q
            tkv = jnp.arange(kv_len) // mask_tile_kv
            bm = block_mask[bi][:, tq][:, :, tkv] != 0  # [Hq, q_len, kv_len]
            s = jnp.where(bm, s, MASK_VALUE)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", p, vi)
        out = out.at[q_start : q_start + q_len].set(o)
    return out


def attention_prefill_bf16_ref(q, k, v, seqlens_q, cu_seqlens_q, max_seqlens_q):
    """Dense packed-varlen prefill (reference op #1): K/V packed like Q."""
    b = seqlens_q.shape[0]
    hkv = k.shape[1]
    d = k.shape[2]
    dv = v.shape[2]
    max_kv = int(max_seqlens_q)
    kb = jnp.zeros((b, max_kv, hkv, d), jnp.float32)
    vb = jnp.zeros((b, max_kv, hkv, dv), jnp.float32)
    for bi in range(b):
        s = int(cu_seqlens_q[bi])
        l = int(seqlens_q[bi])
        kb = kb.at[bi, :l].set(k[s : s + l].astype(jnp.float32))
        vb = vb.at[bi, :l].set(v[s : s + l].astype(jnp.float32))
    out = mha_varlen_prefill_ref(q, kb, vb, seqlens_q, cu_seqlens_q, seqlens_q)
    return out.astype(jnp.bfloat16)


def attention_with_kvcache_prefill_ref(
    q,
    kcache,
    vcache,
    cu_seqlens_q,
    block_ids,
    seqlens_kvcache,
    max_seqlens_q,
    qscale=None,
    kscale=None,
    vscale=None,
    quant_type: QuantType = QuantType.QPERTOKEN_PERHEAD_KPERTENSOR_VPERTENSOR,
    block_mask=None,
    mask_tile_q: int = 128,
    mask_tile_kv: int = 128,
):
    """Paged-cache prefill (reference ops #2-#4), bf16 or fp8 cache."""
    seqlens_q = (cu_seqlens_q[1:] - cu_seqlens_q[:-1]).astype(jnp.int32)
    max_kv = int(jnp.max(seqlens_kvcache))
    kf, vf = _dequant_kv(kcache, vcache, kscale, vscale, quant_type)
    kb = _gather_pages(kf, block_ids, max_kv)
    vb = _gather_pages(vf, block_ids, max_kv)
    out = mha_varlen_prefill_ref(
        q,
        kb,
        vb,
        seqlens_q,
        cu_seqlens_q,
        seqlens_kvcache,
        q_scale=qscale,
        block_mask=block_mask,
        mask_tile_q=mask_tile_q,
        mask_tile_kv=mask_tile_kv,
    )
    return out.astype(jnp.bfloat16)


def attention_decode_ref(
    q,  # [B*Sq, Hq, D] bf16 (fp8 Q dequantized via qscale before the call)
    kcache,
    vcache,
    block_ids,
    num_seq_kvcache,
    mtp: int = 0,
    new_kv_included: bool = True,
    qscale=None,  # [B, Hq] per-token-per-head Q scale (fp8 path)
    kscale=None,
    vscale=None,
    quant_type: QuantType = QuantType.QPERTOKEN_PERHEAD_KPERTENSOR_VPERTENSOR,
):
    """Paged decode attention with MTP draft tokens (reference ops #5-#6).

    num_seq_kvcache semantics follow the reference: when new_kv_included is
    False the effective KV length is num_seq_kvcache + mtp + 1.
    """
    sq = mtp + 1
    b = num_seq_kvcache.shape[0]
    hq, d = q.shape[1], q.shape[2]
    kv_len = num_seq_kvcache + (0 if new_kv_included else sq)
    max_kv = int(jnp.max(kv_len))

    kf, vf = _dequant_kv(kcache, vcache, kscale, vscale, quant_type)
    kb = _gather_pages(kf, block_ids, max_kv)  # [B, max_kv, Hkv, D]
    vb = _gather_pages(vf, block_ids, max_kv)
    hkv = kb.shape[2]
    g = hq // hkv

    qf = q.astype(jnp.float32).reshape(b, sq, hq, d)
    if qscale is not None:
        qf = qf * qscale.reshape(b, sq, hq)[..., None]
    scale = 1.0 / jnp.sqrt(d)

    kbg = jnp.repeat(kb, g, axis=2)  # [B, max_kv, Hq, D]
    vbg = jnp.repeat(vb, g, axis=2)
    s = jnp.einsum("bqhd,bkhd->bhqk", qf, kbg) * scale
    kpos = jnp.arange(max_kv)[None, None, None, :]
    qpos = (kv_len[:, None] - sq + jnp.arange(sq)[None, :])[:, None, :, None]
    mask = kpos <= qpos
    s = jnp.where(mask, s, MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, vbg)
    return o.reshape(b * sq, hq, -1).astype(jnp.bfloat16)


__all__ = [
    "MASK_VALUE",
    "mha_varlen_prefill_ref",
    "attention_prefill_bf16_ref",
    "attention_with_kvcache_prefill_ref",
    "attention_decode_ref",
]
