"""Tests for the fused sampler (reference: tests/test_sampler.py).
Bit-exact golden tests against a numpy reference using injected Gumbel noise."""

import jax.numpy as jnp
import numpy as np
import pytest

from hpc_ops_tpu.config import SoftmaxPolicy
from hpc_ops_tpu.ops.sampler import fused_sampler, fused_sampler_temperature_sample


def np_ref_sampler(
    logits,
    gumbel,
    penalty_mask=None,
    slot_id=None,
    rep=0.0,
    temp=0.0,
    policy=SoftmaxPolicy.NONE,
    topk=0,
    topp=0.0,
    max_topk=32,
):
    """Port of the reference's pure implementation (tests/test_sampler.py:47-167)."""
    work = np.array(logits, np.float64)
    b, v = work.shape
    rp = np.full(b, rep, np.float64) if np.isscalar(rep) else np.asarray(rep, np.float64)
    tp = np.full(b, topp, np.float64) if np.isscalar(topp) else np.asarray(topp, np.float64)
    tk = np.full(b, topk, np.int64) if np.isscalar(topk) else np.asarray(topk, np.int64)
    tmp = np.full(b, temp, np.float64) if np.isscalar(temp) else np.asarray(temp, np.float64)

    if penalty_mask is not None:
        for bi in range(b):
            if rp[bi] <= 0:
                continue
            row = penalty_mask[slot_id[bi]]
            bits = np.zeros(row.size * 8, bool)
            for i in range(row.size * 8):
                bits[i] = (row[i // 8] >> (i % 8)) & 1
            keep = bits[:v]
            w = work[bi]
            posm = keep & (w > 0)
            negm = keep & (w <= 0)
            w[posm] = w[posm] / rp[bi]
            w[negm] = w[negm] * rp[bi]

    for bi in range(b):
        if tmp[bi] > 0:
            work[bi] /= tmp[bi]

    if policy == SoftmaxPolicy.BEFORE_TOPK:
        e = np.exp(work - work.max(-1, keepdims=True))
        work = e / e.sum(-1, keepdims=True)

    out = np.zeros((b, 1), np.int32)
    mask_out = penalty_mask.copy() if penalty_mask is not None else None
    for bi in range(b):
        kb = int(tk[bi])
        if kb <= 0 or kb > max_topk:
            kb = max_topk
        order = np.argsort(-work[bi], kind="stable")[:kb]
        vals = work[bi][order]
        if policy == SoftmaxPolicy.AFTER_TOPK:
            e = np.exp(vals - vals.max())
            probs = e / e.sum()
            vfg = np.log(probs)
        elif policy == SoftmaxPolicy.BEFORE_TOPK:
            probs = vals
            vfg = np.where(probs > 0, np.log(np.maximum(probs, 1e-300)), -np.inf)
        else:
            probs = None
            vfg = vals
        keep = np.ones(kb, bool)
        if tp[bi] > 0:
            cs = np.cumsum(probs) - probs
            keep = (np.arange(kb) == 0) | (cs < tp[bi])
        key = vfg + np.asarray(gumbel, np.float64)[bi, order]
        key[~keep] = -np.inf
        mx = key.max()
        cand = np.nonzero(key == mx)[0]
        tok = int(order[cand].min())
        out[bi, 0] = tok
        if mask_out is not None:
            mask_out[slot_id[bi], tok // 8] |= 1 << (tok % 8)
    return out, mask_out


@pytest.mark.parametrize("batch", [1, 4])
def test_only_logits(batch):
    rng = np.random.RandomState(0)
    v = 4096
    logits = rng.randn(batch, v).astype(np.float32)
    gumbel = -np.log(-np.log(rng.rand(batch, v).clip(1e-20))).astype(np.float32)

    tok, mask = fused_sampler(
        jnp.asarray(logits), gumbel_noise=jnp.asarray(gumbel), max_topk=32
    )
    want, _ = np_ref_sampler(logits, gumbel, max_topk=32)
    assert mask is None
    np.testing.assert_array_equal(np.asarray(tok), want)


@pytest.mark.parametrize("policy", [SoftmaxPolicy.BEFORE_TOPK, SoftmaxPolicy.AFTER_TOPK])
@pytest.mark.parametrize("max_topk", [32, 64])
def test_full_pipeline(policy, max_topk):
    rng = np.random.RandomState(7)
    b, v = 5, 2048
    logits = (rng.randn(b, v) * 3).astype(np.float32)
    gumbel = -np.log(-np.log(rng.rand(b, v).clip(1e-20))).astype(np.float32)
    penalty_mask = rng.randint(0, 256, (8, v // 8)).astype(np.uint8)
    slot_id = rng.permutation(8)[:b].astype(np.int32)
    rep = np.abs(rng.rand(b)).astype(np.float32) + 1.0
    temp = (rng.rand(b) + 0.5).astype(np.float32)
    topk = rng.randint(1, max_topk + 1, b).astype(np.int32)
    topp = (rng.rand(b) * 0.9 + 0.05).astype(np.float32)

    tok, new_mask = fused_sampler(
        jnp.asarray(logits),
        penalty_mask=jnp.asarray(penalty_mask),
        slot_id=jnp.asarray(slot_id),
        repetition_penalty=jnp.asarray(rep),
        temperature=jnp.asarray(temp),
        softmax_policy=policy,
        topk=jnp.asarray(topk),
        topp=jnp.asarray(topp),
        max_topk=max_topk,
        gumbel_noise=jnp.asarray(gumbel),
    )
    want, want_mask = np_ref_sampler(
        logits, gumbel, penalty_mask, slot_id, rep, temp, policy, topk, topp, max_topk
    )
    np.testing.assert_array_equal(np.asarray(tok), want)
    np.testing.assert_array_equal(np.asarray(new_mask), want_mask)


def test_temperature_fast_path_and_draft_mask():
    rng = np.random.RandomState(11)
    b, v = 4, 1024
    logits = rng.randn(b, v).astype(np.float32)
    gumbel = -np.log(-np.log(rng.rand(b, v).clip(1e-20))).astype(np.float32)
    temp = 0.7
    draft = np.array([5, -1, 100, -1], np.int64)

    tok = fused_sampler_temperature_sample(
        jnp.asarray(logits), temp, jnp.asarray(gumbel), jnp.asarray(draft)
    )
    score = logits / temp + gumbel
    score[0, 5] = -np.inf
    score[2, 100] = -np.inf
    want = score.argmax(-1).astype(np.int32)[:, None]
    np.testing.assert_array_equal(np.asarray(tok), want)

    # dispatch from the public entry
    tok2, mask2 = fused_sampler(
        jnp.asarray(logits),
        temperature=temp,
        gumbel_noise=jnp.asarray(gumbel),
        draft_token_ids=jnp.asarray(draft),
    )
    assert mask2 is None
    np.testing.assert_array_equal(np.asarray(tok2), want)


def test_error_paths():
    logits = jnp.zeros((2, 256), jnp.float32)
    with pytest.raises(ValueError):
        fused_sampler(logits, max_topk=16)
    with pytest.raises(ValueError):
        fused_sampler(
            logits, topp=0.5, softmax_policy=SoftmaxPolicy.NONE, temperature=1.0, topk=4
        )
    with pytest.raises(ValueError):
        fused_sampler(logits, penalty_mask=jnp.zeros((4, 32), jnp.uint8))
    with pytest.raises(ValueError):
        fused_sampler(
            logits,
            topk=4,
            temperature=1.0,
            draft_token_ids=jnp.zeros((2,), jnp.int64),
        )
