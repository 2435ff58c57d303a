"""Tests for the continuous-batching serving engine (runtime/engine.py)."""

import jax
import numpy as np
import pytest

from hpc_ops_tpu.models.llama import init_weights, tiny_config
from hpc_ops_tpu.runtime.engine import Engine


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config()
    weights = init_weights(jax.random.PRNGKey(0), cfg)
    return cfg, weights


def test_engine_batch_matches_solo(model):
    cfg, weights = model
    prompts = [[1, 2, 3, 4, 5], [7, 8], [9, 10, 11]]

    eng = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=4)
    batch_out = eng.run(prompts, max_new=4)

    solo_out = []
    for p in prompts:
        e1 = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=1)
        solo_out.append(e1.run([p], max_new=4)[0])

    assert batch_out == solo_out
    for out in batch_out:
        assert len(out) == 4
        assert all(0 <= t < cfg.vocab for t in out)


def test_engine_streams_and_frees(model):
    cfg, weights = model
    eng = Engine(cfg, weights, num_blocks=32, block_size=16, max_batch=2)
    free0 = eng.alloc.num_free
    r1 = eng.add_request([1, 2, 3], max_new=2)
    r2 = eng.add_request([4, 5], max_new=3)
    while eng.step():
        pass
    assert eng.requests[r1].done and eng.requests[r2].done
    assert len(eng.requests[r1].out) == 2
    assert len(eng.requests[r2].out) == 3
    # all sequence blocks returned to the pool
    assert eng.alloc.num_free == free0


def test_engine_more_requests_than_batch(model):
    cfg, weights = model
    eng = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=2)
    outs = eng.run([[1, 2], [3, 4], [5, 6]], max_new=3)
    assert all(len(o) == 3 for o in outs)


def test_engine_speculative_lossless(model):
    """Greedy speculative decode (MTP verification) must produce
    bit-identical outputs to plain greedy decode, whether drafts are
    rejected (junk drafter) or fully accepted (oracle drafter)."""
    cfg, weights = model
    prompts = [[1, 2, 3, 1, 2, 3, 1, 2], [5, 6, 5, 6, 5]]

    plain = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=2)
    want = plain.run(prompts, max_new=8)

    # junk drafter: every draft is (almost surely) rejected; the correction
    # token alone must reproduce plain decode
    junk = Engine(
        cfg, weights, num_blocks=64, block_size=16, max_batch=2,
        speculative_k=3, draft_fn=lambda tokens, k: [0] * k,
    )
    got = junk.run(prompts, max_new=8)
    assert got == want
    assert junk.spec_proposed > 0

    # oracle drafter: proposes the true continuation -> near-full acceptance
    fulls = [list(p) + list(o) for p, o in zip(prompts, want)]

    def oracle(tokens, k):
        for f in fulls:
            if f[: len(tokens)] == list(tokens):
                return f[len(tokens) : len(tokens) + k]
        return []

    orc = Engine(
        cfg, weights, num_blocks=64, block_size=16, max_batch=2,
        speculative_k=3, draft_fn=oracle,
    )
    got2 = orc.run(prompts, max_new=8)
    assert got2 == want
    stats = orc.speculative_stats
    assert stats["acceptance"] > 0.8  # oracle drafts should be accepted
    # acceptance means fewer model calls: bound the decode step count
    assert orc.spec_proposed >= orc.spec_accepted > 0


def test_engine_speculative_ngram_path(model):
    """The default n-gram drafter engages on genuinely repetitive output."""
    cfg, weights = model
    eng = Engine(
        cfg, weights, num_blocks=64, block_size=16, max_batch=1,
        speculative_k=2,
    )
    plain = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=1)
    prompt = [[3, 9, 4, 3, 9, 4, 3, 9]]
    assert eng.run(prompt, max_new=6) == plain.run(prompt, max_new=6)


def test_ngram_draft():
    from hpc_ops_tpu.runtime.engine import ngram_draft

    # last bigram (2, 3) seen earlier, followed by 4, 5
    assert ngram_draft([1, 2, 3, 4, 5, 2, 3], k=2) == [4, 5]
    assert ngram_draft([1, 2], k=2) == []  # too short
    assert ngram_draft([1, 2, 3, 4], k=2) == []  # no earlier match


def test_engine_chunked_prefill(model):
    """Chunked prefill is token-exact vs one-shot prefill (incremental
    prefill equivalence), across chunk sizes incl. non-divisors."""
    cfg, weights = model
    prompts = [list(range(1, 20)), [7, 8, 9], list(range(30, 60))]
    ref = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=4).run(
        prompts, max_new=5
    )
    for chunk in (4, 16):
        eng = Engine(
            cfg, weights, num_blocks=64, block_size=16, max_batch=4,
            prefill_chunk=chunk,
        )
        assert eng.run(prompts, max_new=5) == ref


def test_engine_chunked_prefill_interleaves(model):
    """Decode batches run BETWEEN the chunks of a long prompt — a long
    prefill must not stall active requests' token generation."""
    cfg, weights = model
    eng = Engine(
        cfg, weights, num_blocks=64, block_size=16, max_batch=4,
        prefill_chunk=4,
    )
    r1 = eng.add_request([1, 2, 3], max_new=4)
    r2 = eng.add_request(list(range(1, 41)), max_new=2)
    eng.step()  # r1 prompt fits one chunk -> fully prefilled + activated
    assert eng.requests[r1].prefilled == 3 and len(eng.requests[r1].out) == 1
    eng.step()  # alternation: decode r1 before r2's next chunk
    assert len(eng.requests[r1].out) == 2
    assert eng.requests[r2].prefilled == 0
    eng.step()  # now a chunk of r2
    assert eng.requests[r2].prefilled == 4
    eng.step()  # and a decode again
    assert len(eng.requests[r1].out) == 3
    while eng.step():
        pass
    assert eng.requests[r2].done and len(eng.requests[r2].out) == 2


def test_engine_int8_kv_serving():
    """Engine drives the quantized serving mode unchanged: fused int8 K|V
    slab caches, Pallas store on decode, FUSED int8 decode attention.
    Batch-vs-solo determinism must hold exactly as in bf16."""
    cfg = tiny_config(int8_kv=True, kv_scale=0.02)
    weights = init_weights(jax.random.PRNGKey(0), cfg)
    prompts = [[1, 2, 3, 4, 5], [7, 8], [9, 10, 11]]

    eng = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=4)
    batch_out = eng.run(prompts, max_new=4)

    e1 = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=1)
    solo_out = [e1.run([p], max_new=4)[0] for p in prompts]

    assert batch_out == solo_out
    for out in batch_out:
        assert len(out) == 4
        assert all(0 <= t < cfg.vocab for t in out)
