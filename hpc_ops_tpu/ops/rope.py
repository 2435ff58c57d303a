"""Fused RoPE + optional QK-RMSNorm + paged KV-cache store (BF16 and FP8).

Reference parity: hpc/rope.py (rope_norm_store_kv, rope_norm_store_kv_fp8) and
tests/test_rope.py:36-117 (NeoX rotate-half convention, cos_sin table
``[cos | sin]`` of width head_dim, qk_norm_policy 0/1/2, paged writes with
last-block tail zeroing).

TPU design: the whole op is gather (cos/sin rows) + elementwise rotate/norm +
scatter (paged store). XLA compiles this into fused gather/scatter kernels;
the varlen bookkeeping (row -> request -> position) is plain vectorized
arithmetic on the scalar tables, so no Pallas kernel is needed to hit HBM
roofline — every element is read once and written once.

Functional form: caches are inputs AND outputs (donate them under jit for
in-place updates).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from hpc_ops_tpu.config import FP8_DTYPE, FP8_MAX, QKNormPolicy, QuantPolicy
from hpc_ops_tpu.ops.kv_cache import (
    PagedKVCache,
    flat_slot_ids,
    store_kv,
    zero_block_tails,
)
from hpc_ops_tpu.utils.common import fp8_saturate_cast, interpret_default, round_up

_NORM_EPS = 1e-6


def can_use_rope_kernel(
    rows: int, cache_dtype, qkv_dtype, cache_layout: str, store_to_cache: bool
) -> bool:
    """True when the Pallas fused store kernel (ops/rope_kernel.py) applies:
    bf16 cache, NHD or HND layout, and a tileable row count. Callers opting
    in with ``impl="pallas"`` additionally promise that EVERY qkv row is a
    real token (the reference's own contract — hpc/rope.py sizes qkv to
    exactly total_tokens); padded/invalid rows must stay on the XLA path."""
    from hpc_ops_tpu.ops.rope_kernel import pick_row_tile

    return (
        store_to_cache
        and cache_layout in ("NHD", "HND")
        and cache_dtype == jnp.bfloat16
        and qkv_dtype == jnp.bfloat16
        and pick_row_tile(rows) is not None
    )


def make_cos_sin_cache(
    max_position: int,
    head_dim: int,
    base: float = 10000.0,
    rope_scaling: dict | None = None,
):
    """[max_position, head_dim] table: first half cos(t*f), second half sin.

    ``rope_scaling`` (HF-config-style dict) supports long-context
    frequency scaling of checkpoints trained with it:
      * ``{"rope_type": "linear", "factor": f}`` — all frequencies / f;
      * ``{"rope_type": "llama3", "factor": f, "low_freq_factor": lo,
        "high_freq_factor": hi, "original_max_position_embeddings": L}``
        — Llama-3.1's wavelength-banded rule: high-frequency (short
        wavelength) components keep their frequency, low-frequency ones
        divide by f, and the band between interpolates smoothly.
    """
    inv_freq = 1.0 / (
        base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    if rope_scaling is not None:
        kind = rope_scaling.get("rope_type") or rope_scaling.get("type")
        factor = float(rope_scaling["factor"])
        if kind == "linear":
            inv_freq = inv_freq / factor
        elif kind == "llama3":
            lo_f = float(rope_scaling["low_freq_factor"])
            hi_f = float(rope_scaling["high_freq_factor"])
            orig = float(rope_scaling["original_max_position_embeddings"])
            wavelen = 2.0 * jnp.pi / inv_freq
            smooth = (orig / wavelen - lo_f) / (hi_f - lo_f)
            smooth = jnp.clip(smooth, 0.0, 1.0)
            scaled = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
            inv_freq = jnp.where(
                wavelen < orig / hi_f,  # high-frequency band: unscaled
                inv_freq,
                jnp.where(wavelen > orig / lo_f, inv_freq / factor, scaled),
            )
        else:
            raise ValueError(f"unsupported rope_scaling type: {kind!r}")
    t = jnp.arange(max_position, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)
    return jnp.concatenate([jnp.cos(freqs), jnp.sin(freqs)], axis=-1)


def _rotate_neox(x: jax.Array, cs: jax.Array) -> jax.Array:
    """NeoX RoPE: x [rows, H, D], cs [rows, D] -> rotated [rows, H, D] fp32."""
    d = x.shape[-1]
    h = d // 2
    x1, x2 = x[..., :h], x[..., h:]
    c = cs[:, None, :h]
    s = cs[:, None, h:]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def _head_rmsnorm(x: jax.Array, w: jax.Array, eps: float = _NORM_EPS) -> jax.Array:
    """Per-head RMSNorm over head_dim (fp32). w: [D]."""
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)[None, None, :]


class _Varlen(NamedTuple):
    req_ids: jax.Array  # [rows]
    positions: jax.Array  # [rows] logical position in the sequence
    pos_in_q: jax.Array  # [rows] index within the request's new tokens
    valid: jax.Array  # [rows]


def _row_mapping(num_rows: int, num_seqlen_per_req, q_index) -> _Varlen:
    """row -> (request, absolute position). q_index: [num_req+1] prefix sums."""
    row = jnp.arange(num_rows, dtype=jnp.int32)
    # req such that q_index[req] <= row < q_index[req+1]
    req = jnp.searchsorted(q_index[1:], row, side="right").astype(jnp.int32)
    num_req = num_seqlen_per_req.shape[0]
    req_c = jnp.minimum(req, num_req - 1)
    q_start = q_index[req_c]
    q_len = q_index[req_c + 1] - q_start
    seqlen = num_seqlen_per_req[req_c]
    pos_in_q = row - q_start
    pos = seqlen - q_len + pos_in_q
    valid = (row < q_index[num_req]) & (pos >= 0) & (q_len > 0)
    return _Varlen(req_c, pos, pos_in_q, valid)


def _split_qkv(qkv, num_q_heads, num_kv_heads, qk_dim, v_dim):
    rows = qkv.shape[0]
    q_end = num_q_heads * qk_dim
    k_end = q_end + num_kv_heads * qk_dim
    q = qkv[:, :q_end].reshape(rows, num_q_heads, qk_dim)
    k = qkv[:, q_end:k_end].reshape(rows, num_kv_heads, qk_dim)
    v = qkv[:, k_end:].reshape(rows, num_kv_heads, v_dim)
    return q, k, v


def _rope_norm_core(
    qkv,
    cos_sin,
    num_seqlen_per_req,
    q_index,
    q_norm_weight,
    k_norm_weight,
    qk_norm_policy,
    num_kv_heads,
    qk_dim,
    v_dim,
):
    """Shared math: split, (norm), rope, (norm). Returns fp32 q, k, v + mapping."""
    rows, hidden = qkv.shape
    num_q_heads = (hidden - num_kv_heads * (qk_dim + v_dim)) // qk_dim
    q, k, v = _split_qkv(qkv, num_q_heads, num_kv_heads, qk_dim, v_dim)
    m = _row_mapping(rows, num_seqlen_per_req, q_index)

    cs = cos_sin[jnp.maximum(m.positions, 0)].astype(jnp.float32)  # [rows, D]
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)

    policy = QKNormPolicy(qk_norm_policy)
    if policy == QKNormPolicy.NORM_THEN_ROPE:
        q = _head_rmsnorm(q, q_norm_weight)
        k = _head_rmsnorm(k, k_norm_weight)
    q = _rotate_neox(q, cs)
    k = _rotate_neox(k, cs)
    if policy == QKNormPolicy.ROPE_THEN_NORM:
        q = _head_rmsnorm(q, q_norm_weight)
        k = _head_rmsnorm(k, k_norm_weight)
    return q, k, v, m


def rope_norm_store_kv(
    key_cache: jax.Array,
    value_cache: jax.Array,
    qkv: jax.Array,
    cos_sin: jax.Array,
    num_seqlen_per_req: jax.Array,
    q_index: jax.Array,
    kvcache_indices: jax.Array,
    is_prefill: bool,
    q_norm_weight: Optional[jax.Array] = None,
    k_norm_weight: Optional[jax.Array] = None,
    qk_norm_policy: int = 0,
    store_to_cache: bool = True,
    cache_layout: str = "NHD",
    zero_tails: bool = True,
    impl: str = "auto",
    interpret: bool | None = None,
):
    """RoPE + optional QK RMSNorm + paged-KV store (BF16).

    Args mirror hpc/rope.py:7-98; caches are returned (functional in-place).

    impl: "auto"/"xla" use the XLA gather/scatter formulation (tolerates
    padded rows). "pallas" opts into the fused Pallas store kernel
    (ops/rope_kernel.py) — the serving fast path; the caller promises every
    qkv row is a real token (the reference's own sizing contract). Falls
    back to XLA when ``can_use_rope_kernel`` is False.

    Returns:
      (q_rotated [rows, Hq, Dqk] bf16, new_key_cache, new_value_cache)
      If ``store_to_cache`` is False, returns (q, k_out, v_out) buffers instead
      (the reference's out_k/out_v mode).
    """
    del is_prefill  # one unified path: positions come from the scalar tables
    if cache_layout == "HND":
        num_kv_heads, qk_dim = key_cache.shape[0], key_cache.shape[3]
    else:
        num_kv_heads, qk_dim = key_cache.shape[2], key_cache.shape[3]
    v_dim = value_cache.shape[3]
    itp = interpret_default() if interpret is None else interpret
    # Mosaic DMA legality: a single token row is a leading-dim slice of the
    # NHD cache viewed [S, hkv, d] (legal), but a *sublane*-dim slice of the
    # head-major HND cache [hkv, S, d] (illegal — slice shapes on the last
    # two dims must be tile-aligned, HBM refs included). HND therefore only
    # runs the fused kernel in interpret mode; compiled TPU falls back to
    # the XLA scatter.
    if (
        impl == "pallas"
        and (cache_layout == "NHD" or itp)
        and can_use_rope_kernel(
            qkv.shape[0], key_cache.dtype, qkv.dtype, cache_layout, store_to_cache
        )
    ):
        return _rope_store_pallas(
            key_cache,
            value_cache,
            qkv,
            cos_sin,
            num_seqlen_per_req,
            q_index,
            kvcache_indices,
            q_norm_weight,
            k_norm_weight,
            qk_norm_policy,
            num_kv_heads,
            qk_dim,
            v_dim,
            cache_layout,
            zero_tails,
            itp,
        )
    q, k, v, m = _rope_norm_core(
        qkv,
        cos_sin,
        num_seqlen_per_req,
        q_index,
        q_norm_weight,
        k_norm_weight,
        qk_norm_policy,
        num_kv_heads,
        qk_dim,
        v_dim,
    )
    q_out = jnp.where(m.valid[:, None, None], q, 0).astype(jnp.bfloat16)
    if not store_to_cache:
        k_out = jnp.where(m.valid[:, None, None], k, 0).astype(jnp.bfloat16)
        v_out = jnp.where(m.valid[:, None, None], v.astype(jnp.float32), 0).astype(
            jnp.bfloat16
        )
        return q_out, k_out, v_out

    cache = PagedKVCache(key_cache, value_cache)
    blk = key_cache.shape[2] if cache_layout == "HND" else key_cache.shape[1]
    slots = flat_slot_ids(m.positions, m.req_ids, kvcache_indices, blk, m.valid)
    cache = store_kv(cache, k, v, slots, layout=cache_layout)
    if zero_tails:
        # this framework's attention kernels mask by kv_len, so garbage in
        # block tails is never read — zeroing every step costs a scatter
        # over up to block_size rows per request; opt in only when a
        # consumer reads raw pages
        cache = zero_block_tails(
            cache, num_seqlen_per_req, kvcache_indices, layout=cache_layout
        )
    return q_out, cache.k, cache.v


def _rope_store_pallas(
    key_cache,
    value_cache,
    qkv,
    cos_sin,
    num_seqlen_per_req,
    q_index,
    kvcache_indices,
    q_norm_weight,
    k_norm_weight,
    qk_norm_policy,
    num_kv_heads,
    qk_dim,
    v_dim,
    cache_layout,
    zero_tails,
    interpret,
):
    """Fused-kernel store path. Every qkv row must be a real token."""
    from hpc_ops_tpu.ops.rope_kernel import rope_store_rows

    rows, hidden = qkv.shape
    num_q_heads = (hidden - num_kv_heads * (qk_dim + v_dim)) // qk_dim
    m = _row_mapping(rows, num_seqlen_per_req, q_index)
    cs_rows = cos_sin[jnp.maximum(m.positions, 0)].astype(jnp.float32)

    if cache_layout == "HND":
        h, nb, bs, _ = key_cache.shape
        kflat = key_cache.reshape(h, nb * bs, qk_dim)
        vflat = value_cache.reshape(h, nb * bs, v_dim)
        head_major = True
    else:  # NHD
        nb, bs, h, _ = key_cache.shape
        kflat = key_cache.reshape(nb * bs, h, qk_dim)
        vflat = value_cache.reshape(nb * bs, h, v_dim)
        head_major = False
    slots = flat_slot_ids(m.positions, m.req_ids, kvcache_indices, bs, m.valid)
    # contract: rows are all real tokens, so slots are in range; the clip
    # only bounds the blast radius of a malformed call (OOB DMA -> last slot)
    slots = jnp.clip(slots, 0, nb * bs - 1)

    q_out, kflat, vflat = rope_store_rows(
        qkv,
        cs_rows,
        q_norm_weight,
        k_norm_weight,
        slots,
        slots,
        (kflat, vflat),
        hq=num_q_heads,
        hkv=num_kv_heads,
        d=qk_dim,
        dv=v_dim,
        qk_norm_policy=qk_norm_policy,
        head_major=head_major,
        interpret=interpret,
    )
    cache = PagedKVCache(
        kflat.reshape(key_cache.shape), vflat.reshape(value_cache.shape)
    )
    if zero_tails:
        cache = zero_block_tails(
            cache, num_seqlen_per_req, kvcache_indices, layout=cache_layout
        )
    return q_out.reshape(rows, num_q_heads, qk_dim), cache.k, cache.v


def rope_norm_store_kv_int8(
    kv_cache: jax.Array,  # [Hkv, nb, 2*bs, D] int8 (fused K|V page layout)
    qkv: jax.Array,
    cos_sin: jax.Array,
    num_seqlen_per_req: jax.Array,
    q_index: jax.Array,
    kvcache_indices: jax.Array,
    is_prefill: bool,
    k_scale: jax.Array,
    v_scale: jax.Array,
    q_norm_weight: Optional[jax.Array] = None,
    k_norm_weight: Optional[jax.Array] = None,
    qk_norm_policy: int = 0,
    impl: str = "auto",
    interpret: bool | None = None,
    cache_layout: str = "FUSED",
    num_kv_heads: int | None = None,
):
    """RoPE + optional QK-norm + symmetric int8 quant + fused-page KV store.

    The TPU-native quantized serving store (no reference counterpart — the
    reference's quantized cache is fp8, hpc/rope.py:101-234; on v5e the
    byte-packed 8-bit cache code is int8 and K|V of a page live in one
    fused slab, see ops/attention/paging.py:pack_kv_fused). Writes
    ``clip(round(x/scale), ±127)`` codes for K (post-rope/norm) and V into
    the token's (page, slot) rows of the fused cache; the result feeds
    ``attention_decode(..., cache_layout="FUSED", kscale, vscale)``.

    Q is returned rotated/normed in bf16 (the FUSED decode kernel takes
    bf16 q with per-tensor KV scales). impl: "pallas" opts into the fused
    store kernel under the same all-rows-real contract as
    :func:`rope_norm_store_kv`; "auto"/"xla" use a scatter formulation
    that tolerates padded rows.

    ``cache_layout="NHD_FUSED"``: kv_cache is the slot-leading fused slab
    [nb, 2*bs, Hkv*D] (pack_kv_fused_nhd; pass ``num_kv_heads``). Because
    a token row is a leading-dim slice there, the Pallas store kernel is
    legal on compiled TPU — this is the serving engine's store fast path.

    Returns (q_rot [rows, Hq, D] bf16, new_kv_cache int8).
    """
    if cache_layout == "NHD_FUSED":
        assert num_kv_heads is not None, "NHD_FUSED needs num_kv_heads"
        nb, bs2, hd = kv_cache.shape
        h = num_kv_heads
        d = hd // h
    else:
        h, nb, bs2, d = kv_cache.shape
    bs = bs2 // 2
    rows, hidden = qkv.shape
    v_dim = d
    q, k, v, m = _rope_norm_core(
        qkv,
        cos_sin,
        num_seqlen_per_req,
        q_index,
        q_norm_weight,
        k_norm_weight,
        qk_norm_policy,
        h,
        d,
        v_dim,
    )
    k_inv = 1.0 / k_scale.reshape(()).astype(jnp.float32)
    v_inv = 1.0 / v_scale.reshape(()).astype(jnp.float32)

    # fused-slab slot math: page rows [0:bs]=K, [bs:2bs]=V (pack_kv_fused)
    blk = m.positions // bs
    off = m.positions % bs
    phys = kvcache_indices[m.req_ids, jnp.maximum(blk, 0)]
    slot_k = phys * bs2 + off
    bad = (phys < 0) | ~m.valid
    oob = jnp.int32(2**31 - 1)

    itp = interpret_default() if interpret is None else interpret
    nhd = cache_layout == "NHD_FUSED"
    # Head-major FUSED: a token row is a sublane-dim slice — Mosaic forbids
    # that DMA shape (see rope_norm_store_kv), so the fused kernel path is
    # interpret-only there. NHD_FUSED keeps the slot dim leading, so the
    # kernel's per-token DMA is legal on compiled TPU.
    use_pallas = (
        impl == "pallas"
        and (nhd or itp)
        and can_use_rope_kernel(rows, jnp.bfloat16, qkv.dtype, "HND", True)
    )
    if use_pallas:
        from hpc_ops_tpu.ops.rope_kernel import rope_store_rows

        if nhd:
            kvflat = kv_cache.reshape(nb * bs2, h, d)
        else:
            kvflat = kv_cache.reshape(h, nb * bs2, d)
        # contract: all rows real -> slots in range; clip bounds a
        # malformed call's blast radius (see rope_norm_store_kv)
        sk = jnp.clip(slot_k, 0, nb * bs2 - 1 - bs)
        cs_rows = cos_sin[jnp.maximum(m.positions, 0)].astype(jnp.float32)
        q_out, kvflat = rope_store_rows(
            qkv,
            cs_rows,
            q_norm_weight,
            k_norm_weight,
            sk,
            sk + bs,
            (kvflat,),
            hq=q.shape[1],
            hkv=h,
            d=d,
            dv=v_dim,
            qk_norm_policy=qk_norm_policy,
            head_major=not nhd,
            k_scale_inv=k_inv,
            v_scale_inv=v_inv,
            interpret=itp,
        )
        return (
            q_out.reshape(rows, q.shape[1], d),
            kvflat.reshape(kv_cache.shape),
        )

    k_q = jnp.clip(jnp.round(k * k_inv), -127, 127).astype(jnp.int8)
    v_q = jnp.clip(jnp.round(v.astype(jnp.float32) * v_inv), -127, 127).astype(
        jnp.int8
    )
    if nhd:
        kvflat = kv_cache.reshape(nb * bs2, h * d)
        kvflat = kvflat.at[jnp.where(bad, oob, slot_k)].set(
            k_q.reshape(rows, h * d), mode="drop"
        )
        kvflat = kvflat.at[jnp.where(bad, oob, slot_k + bs)].set(
            v_q.reshape(rows, h * d), mode="drop"
        )
    else:
        kvflat = kv_cache.reshape(h, nb * bs2, d)
        kvflat = kvflat.at[:, jnp.where(bad, oob, slot_k), :].set(
            k_q.transpose(1, 0, 2), mode="drop"
        )
        kvflat = kvflat.at[:, jnp.where(bad, oob, slot_k + bs), :].set(
            v_q.transpose(1, 0, 2), mode="drop"
        )
    q_out = jnp.where(m.valid[:, None, None], q, 0.0).astype(jnp.bfloat16)
    return q_out, kvflat.reshape(kv_cache.shape)


def rope_norm_store_kv_fp8(
    key_cache: jax.Array,
    value_cache: jax.Array,
    qkv: jax.Array,
    cos_sin: jax.Array,
    num_seqlen_per_req: jax.Array,
    q_index: jax.Array,
    kvcache_indices: jax.Array,
    is_prefill: bool,
    k_scale: jax.Array,
    v_scale: jax.Array,
    quant_policy: int,
    max_seqlens: int = 0,
    upper_max: Optional[float] = None,
    q_scale_inv: Optional[jax.Array] = None,
    q_norm_weight: Optional[jax.Array] = None,
    k_norm_weight: Optional[jax.Array] = None,
    qk_norm_policy: int = 0,
    cache_layout: str = "NHD",
    zero_tails: bool = True,
):
    """FP8 variant: quantizes Q (dynamic per-token-per-head or static) and
    stores K/V into an FP8 cache with static per-tensor scales.

    Reference parity: hpc/rope.py:101-234. Dequantization convention is
    ``x = x_fp8 * scale`` throughout.

    Returns:
      (q_fp8 [rows, Hq, Dqk], q_scale, split_k_flag [num_req, Hkv] zeros,
       new_key_cache, new_value_cache)
      q_scale is [num_req, Hq, round_up(max_seqlens,128)] in prefill,
      [rows, Hq] in decode, or None when quant_policy=STATIC.
    """
    upper = FP8_MAX if upper_max is None else float(upper_max)
    if cache_layout == "HND":
        num_kv_heads, qk_dim = key_cache.shape[0], key_cache.shape[3]
    else:
        num_kv_heads, qk_dim = key_cache.shape[2], key_cache.shape[3]
    v_dim = value_cache.shape[3]
    num_req = num_seqlen_per_req.shape[0]
    rows = qkv.shape[0]
    q, k, v, m = _rope_norm_core(
        qkv,
        cos_sin,
        num_seqlen_per_req,
        q_index,
        q_norm_weight,
        k_norm_weight,
        qk_norm_policy,
        num_kv_heads,
        qk_dim,
        v_dim,
    )
    num_q_heads = q.shape[1]

    if QuantPolicy(quant_policy) == QuantPolicy.DYNAMIC_Q_STATIC_KV:
        amax = jnp.max(jnp.abs(q), axis=-1)  # [rows, Hq]
        scale_rowhead = jnp.maximum(amax / upper, 1e-12)
        q_fp8 = fp8_saturate_cast(q / scale_rowhead[..., None], upper)
        if is_prefill:
            pad = round_up(max(int(max_seqlens), 1), 128)
            ok = m.valid & (m.pos_in_q < pad)
            # scatter [rows, Hq] scales to [num_req, Hq, pad]; invalid rows
            # target an OOB request index and are dropped.
            q_scale = jnp.zeros((num_req, num_q_heads, pad), jnp.float32).at[
                jnp.where(ok, m.req_ids, 2**30),
                :,
                jnp.where(ok, m.pos_in_q, 0),
            ].set(scale_rowhead, mode="drop")
        else:
            q_scale = jnp.where(m.valid[:, None], scale_rowhead, 0.0)
    else:
        assert q_scale_inv is not None, "quant_policy=2 requires q_scale_inv"
        q_fp8 = fp8_saturate_cast(q * q_scale_inv.reshape(()).astype(jnp.float32), upper)
        q_scale = None

    q_fp8 = jnp.where(m.valid[:, None, None], q_fp8, jnp.zeros_like(q_fp8))

    k_q = fp8_saturate_cast(k / k_scale.reshape(()).astype(jnp.float32), upper)
    v_q = fp8_saturate_cast(
        v.astype(jnp.float32) / v_scale.reshape(()).astype(jnp.float32), upper
    )

    cache = PagedKVCache(key_cache, value_cache)
    blk = key_cache.shape[2] if cache_layout == "HND" else key_cache.shape[1]
    slots = flat_slot_ids(m.positions, m.req_ids, kvcache_indices, blk, m.valid)
    cache = store_kv(cache, k_q, v_q, slots, layout=cache_layout)
    if zero_tails:
        cache = zero_block_tails(
            cache, num_seqlen_per_req, kvcache_indices, layout=cache_layout
        )

    split_k_flag = jnp.zeros((num_req, num_kv_heads), jnp.int32)
    return q_fp8, q_scale, split_k_flag, cache.k, cache.v


__all__ = [
    "make_cos_sin_cache",
    "rope_norm_store_kv",
    "rope_norm_store_kv_fp8",
    "rope_norm_store_kv_int8",
]
