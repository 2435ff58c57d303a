"""Fused sampler: rep-penalty → temperature → [softmax] → top-k → [softmax] →
top-p → Gumbel-max → penalty-mask writeback.

Reference parity: hpc/sampler.py:42-182 and the bit-exact pure reference in
tests/test_sampler.py:47-167. Semantics preserved exactly:

  * Sampling is bounded to the top-``max_topk`` (32/64) candidates — user
    ``topk==0`` means "don't tighten below max_topk", NOT full vocab.
  * The temperature-only fast path scores the FULL vocab
    (``score = logit/temp + gumbel`` argmax) and supports draft-token
    masking for speculative decode.
  * Ties in the Gumbel-max break toward the smaller token id.
  * With caller-supplied ``gumbel_noise`` the result is bit-reproducible.

Functional form: the penalty-mask writeback (CUDA atomicOr) becomes a
returned updated mask. All heavy stages (full-vocab scan, top_k) are single
fused XLA ops on TPU; the whole pipeline compiles into a handful of kernels
(the reference needs 2 hand-written kernels + scratch management).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from hpc_ops_tpu.config import SoftmaxPolicy

_NEG_INF = float("-inf")


def _per_batch(x, b, dtype) -> jax.Array:
    """Broadcast scalar-or-[B] to [B]."""
    if isinstance(x, jax.Array) and x.ndim > 0:
        return x.astype(dtype)
    return jnp.full((b,), x, dtype)


def _unpack_bits(mask_rows: jax.Array, v: int) -> jax.Array:
    """[B, ceil(V/8)] uint8 -> [B, V] bool; token i bit = row[i//8] >> (i%8)."""
    b = mask_rows.shape[0]
    bits = jnp.unpackbits(mask_rows, axis=-1, bitorder="little")
    return bits[:, :v].astype(bool)


def gumbel_from_uniform(u: jax.Array) -> jax.Array:
    """Gumbel(0) noise from uniform(0,1]: -log(-log(u)) (reference convention,
    hpc/sampler.py:99-101)."""
    return -jnp.log(-jnp.log(jnp.clip(u, 1e-20, 1.0)))


def fused_sampler(
    logits: jax.Array,
    *,
    penalty_mask: Optional[jax.Array] = None,
    slot_id: Optional[jax.Array] = None,
    repetition_penalty: Union[jax.Array, float] = 0.0,
    temperature: Union[jax.Array, float] = 0.0,
    softmax_policy: SoftmaxPolicy = SoftmaxPolicy.NONE,
    topk: Union[jax.Array, int] = 0,
    topp: Union[jax.Array, float] = 0.0,
    max_topk: int = 32,
    gumbel_noise: Optional[jax.Array] = None,
    draft_token_ids: Optional[jax.Array] = None,
    seed: int = 0,
    topk_impl: str = "exact",
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Fused sampling step.

    Args mirror hpc/sampler.py:42-123 (see module docstring). ``logits`` is
    [B, V] float32/bfloat16.

    ``topk_impl``: "exact" (default — lax.top_k, the reference contract,
    bit-matches the jnp oracle) or "approx" — lax.approx_max_k, the TPU's
    PartialReduce unit: measured 35 vs 782 µs at [64, 120832] (the exact
    sort runs at 40 GB/s, the approx scan at 881 = the HBM byte rate).
    Deterministic (fixed reduction pattern) but each true top-k element
    is only included with ~0.95 expected recall, concentrated on the
    boundary candidates whose post-softmax mass is negligible — the
    serving trade, not the testing one.

    Returns:
      (token_ids [B, 1] int32, updated_penalty_mask or None).
    """
    if isinstance(softmax_policy, int):
        softmax_policy = SoftmaxPolicy(softmax_policy)
    if max_topk not in (32, 64):
        raise ValueError(f"max_topk must be 32 or 64, got {max_topk}")

    b, v = logits.shape

    def _is_scalar_zero(x):
        return (not isinstance(x, jax.Array)) and float(x) == 0.0

    temp_is_tensor = isinstance(temperature, jax.Array) and temperature.ndim > 0
    fast = (
        penalty_mask is None
        and slot_id is None
        and _is_scalar_zero(repetition_penalty)
        and _is_scalar_zero(topp)
        and not isinstance(topk, jax.Array)
        and int(topk) == 0
        and softmax_policy == SoftmaxPolicy.NONE
        and (temp_is_tensor or (not temp_is_tensor and float(temperature) > 0.0))
    )
    if fast:
        return (
            fused_sampler_temperature_sample(
                logits, temperature, gumbel_noise, draft_token_ids, seed
            ),
            None,
        )
    if draft_token_ids is not None:
        raise ValueError(
            "draft_token_ids currently requires the temperature-only fast path"
        )
    if (penalty_mask is None) != (slot_id is None):
        raise ValueError("penalty_mask and slot_id must be provided together")
    topp_enabled = isinstance(topp, jax.Array) or float(topp) != 0.0
    if topp_enabled and softmax_policy == SoftmaxPolicy.NONE:
        raise ValueError("topp requires softmax_policy != NONE")

    work = logits.astype(jnp.float32)

    # 1. repetition penalty
    if penalty_mask is not None:
        rp = _per_batch(repetition_penalty, b, jnp.float32)
        rows = penalty_mask[slot_id.astype(jnp.int32)]  # [B, V/8]
        bits = _unpack_bits(rows, v)
        apply = bits & (rp > 0)[:, None]
        rp_safe = jnp.where(rp > 0, rp, 1.0)[:, None]
        work = jnp.where(
            apply & (work > 0),
            work / rp_safe,
            jnp.where(apply, work * rp_safe, work),
        )

    # 2. temperature
    t = _per_batch(temperature, b, jnp.float32)
    work = jnp.where((t > 0)[:, None], work / jnp.where(t > 0, t, 1.0)[:, None], work)

    # 3. optional softmax1 over the full vocab
    if softmax_policy == SoftmaxPolicy.BEFORE_TOPK:
        work = jax.nn.softmax(work, axis=-1)

    # 4. top-max_topk candidates (sorted desc; jax breaks ties by lower index)
    if topk_impl == "approx":
        vals, idx = jax.lax.approx_max_k(work, max_topk, recall_target=0.95)
    else:
        vals, idx = jax.lax.top_k(work, max_topk)

    tk = _per_batch(topk, b, jnp.int32)
    k_eff = jnp.where((tk <= 0) | (tk > max_topk), max_topk, tk)
    pos = jnp.arange(max_topk, dtype=jnp.int32)[None, :]
    keep_k = pos < k_eff[:, None]

    if softmax_policy == SoftmaxPolicy.AFTER_TOPK:
        masked = jnp.where(keep_k, vals, _NEG_INF)
        probs = jax.nn.softmax(masked, axis=-1)
        vfg = jnp.where(keep_k, jnp.log(jnp.maximum(probs, 1e-38)), _NEG_INF)
    elif softmax_policy == SoftmaxPolicy.BEFORE_TOPK:
        probs = jnp.where(keep_k, vals, 0.0)
        vfg = jnp.where(probs > 0, jnp.log(jnp.maximum(probs, 1e-38)), _NEG_INF)
    else:
        probs = None
        vfg = vals

    # 5. top-p truncation (first candidate always kept)
    if topp_enabled:
        tp = _per_batch(topp, b, jnp.float32)
        csum_excl = jnp.cumsum(probs, axis=-1) - probs
        keep_p = (pos == 0) | (csum_excl < tp[:, None])
        keep_p = jnp.where((tp > 0)[:, None], keep_p, True)
    else:
        keep_p = True

    keep = keep_k & keep_p

    # 6. Gumbel-max over surviving candidates
    if gumbel_noise is None:
        key = jax.random.PRNGKey(seed)
        gumbel_noise = gumbel_from_uniform(
            jax.random.uniform(key, (b, v), jnp.float32, 1e-20, 1.0)
        )
    noise = jnp.take_along_axis(gumbel_noise.astype(jnp.float32), idx, axis=-1)
    score = jnp.where(keep, vfg + noise, _NEG_INF)
    max_score = jnp.max(score, axis=-1, keepdims=True)
    tie = score == max_score
    token = jnp.min(jnp.where(tie, idx, v), axis=-1).astype(jnp.int32)
    token_ids = token[:, None]

    # 7. penalty writeback (functional): set bit of sampled token
    new_mask = None
    if penalty_mask is not None:
        byte_idx = token // 8
        bit = (1 << (token % 8)).astype(penalty_mask.dtype)
        rows_idx = slot_id.astype(jnp.int32)
        cur = penalty_mask[rows_idx, byte_idx]
        new_mask = penalty_mask.at[rows_idx, byte_idx].set(cur | bit)

    return token_ids, new_mask


def fused_sampler_temperature_sample(
    logits: jax.Array,
    temperature: Union[jax.Array, float],
    gumbel_noise: Optional[jax.Array] = None,
    draft_token_ids: Optional[jax.Array] = None,
    seed: int = 0,
) -> jax.Array:
    """Temperature-only fast path (reference op #17): full-vocab
    ``argmax(logit/temp + Gumbel(0))`` with optional draft-token −inf masking.
    Ties break toward the smaller token id. Returns [B, 1] int32.
    """
    b, v = logits.shape
    t = _per_batch(temperature, b, jnp.float32)
    score = logits.astype(jnp.float32) / t[:, None]
    if draft_token_ids is not None:
        draft = draft_token_ids.astype(jnp.int32)
        col = jnp.arange(v, dtype=jnp.int32)[None, :]
        score = jnp.where(
            (draft[:, None] >= 0) & (col == draft[:, None]), _NEG_INF, score
        )
    if gumbel_noise is None:
        key = jax.random.PRNGKey(seed)
        gumbel_noise = gumbel_from_uniform(
            jax.random.uniform(key, (b, v), jnp.float32, 1e-20, 1.0)
        )
    score = score + gumbel_noise.astype(jnp.float32)
    max_score = jnp.max(score, axis=-1, keepdims=True)
    token = jnp.min(
        jnp.where(score == max_score, jnp.arange(v, dtype=jnp.int32)[None, :], v),
        axis=-1,
    ).astype(jnp.int32)
    return token[:, None]


__all__ = ["fused_sampler", "fused_sampler_temperature_sample", "gumbel_from_uniform"]
