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

    # fused multi-step decode rides the same int8 path token-exactly
    # (Pallas store + FUSED int8 decode inside the scanned graph)
    e_ms = Engine(
        cfg, weights, num_blocks=64, block_size=16, max_batch=4, multi_step=3
    )
    assert e_ms.run([list(p) for p in prompts], max_new=4) == batch_out


def test_decode_multi_matches_single_steps(model):
    """Model-level: decode_multi (n fused steps, one graph) produces the
    same tokens and caches as n single forward_step calls."""
    import functools

    import jax.numpy as jnp

    from hpc_ops_tpu.models.llama import decode_multi, forward_step, init_cache

    cfg, weights = model
    n, b, bs = 4, 2, 16
    caches = init_cache(cfg, num_blocks=16, block_size=bs)
    # prefill two prompts first so decode has history
    prompts = [[1, 2, 3], [5, 6, 7, 8]]
    tables = np.asarray([[0, 1], [2, 3]], np.int32)
    pre = jax.jit(
        functools.partial(forward_step, cfg=cfg, is_prefill=True, max_seqlens_q=8)
    )
    caches_s = caches
    last = []
    for i, p in enumerate(prompts):
        toks = np.zeros((8,), np.int32)
        toks[: len(p)] = p
        logits, caches_s = pre(
            weights, caches_s,
            token_ids=jnp.asarray(toks),
            seq_lens=jnp.asarray([len(p)], jnp.int32),
            q_index=jnp.asarray([0, len(p)], jnp.int32),
            block_ids=jnp.asarray(tables[i : i + 1]),
        )
        last.append(int(np.argmax(np.asarray(logits).reshape(-1))))

    lens0 = np.asarray([len(p) + 1 for p in prompts], np.int32)

    # n single steps
    dec = jax.jit(
        functools.partial(forward_step, cfg=cfg, is_prefill=False, max_seqlens_q=1)
    )
    caches_a = caches_s
    toks_a = []
    cur = list(last)
    lens = lens0.copy()
    for _ in range(n):
        logits, caches_a = dec(
            weights, caches_a,
            token_ids=jnp.asarray(cur, jnp.int32),
            seq_lens=jnp.asarray(lens),
            q_index=jnp.arange(b + 1, dtype=jnp.int32),
            block_ids=jnp.asarray(tables),
        )
        cur = [int(t) for t in np.argmax(np.asarray(logits), axis=-1)]
        toks_a.append(cur)
        lens = lens + 1

    # one fused n-step graph
    toks_b, caches_b = jax.jit(
        functools.partial(decode_multi, cfg=cfg, num_steps=n)
    )(
        weights, caches_s,
        last_tokens=jnp.asarray(last, jnp.int32),
        seq_lens=jnp.asarray(lens0),
        block_ids=jnp.asarray(tables),
    )
    assert np.asarray(toks_b).tolist() == toks_a
    for la, lb in zip(caches_a, caches_b):
        for k in la:
            np.testing.assert_array_equal(np.asarray(la[k]), np.asarray(lb[k]))


def test_engine_multi_step_matches_single(model):
    """Engine(multi_step=4) greedy serving is token-identical to the
    single-step engine, including requests whose max_new is not a multiple
    of the fused block (surplus tokens truncated) and chunked prefill
    interleaving."""
    cfg, weights = model
    prompts = [[1, 2, 3, 4, 5], [7, 8], [9, 10, 11, 12, 13, 14], [15]]

    base = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=4)
    want = base.run([list(p) for p in prompts], max_new=6)

    fused = Engine(
        cfg, weights, num_blocks=64, block_size=16, max_batch=4, multi_step=4
    )
    got = fused.run([list(p) for p in prompts], max_new=6)
    assert got == want

    both = Engine(
        cfg, weights, num_blocks=64, block_size=16, max_batch=4,
        multi_step=3, prefill_chunk=2,
    )
    got2 = both.run([list(p) for p in prompts], max_new=6)
    assert got2 == want

    # pool fully freed despite the slack extension
    free0 = Engine(cfg, weights, num_blocks=64, block_size=16).alloc.num_free
    assert fused.alloc.num_free == free0


def test_engine_prefix_cache_shares_and_stays_exact(model):
    """Requests sharing a long system prompt reuse its KV pages (allocator
    refcounts) and outputs stay token-identical to the uncached engine."""
    cfg, weights = model
    sys_prompt = list(range(1, 40))  # 39 tokens -> 2 full blocks of 16
    prompts = [sys_prompt + [100 + i] for i in range(3)]

    base = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=4)
    want = base.run([list(p) for p in prompts], max_new=4)

    eng = Engine(
        cfg, weights, num_blocks=64, block_size=16, max_batch=4,
        prefix_cache=True,
    )
    got = eng.run([list(p) for p in prompts], max_new=4)
    assert got == want
    assert eng.prefix_hits == 2, eng.prefix_hits
    assert eng.prefix_shared_blocks == 4  # 2 followers x 2 full blocks


def test_engine_prefix_cache_retained_after_finish(model):
    """Pages of finished requests are retained: a later request with the
    same prefix still hits, and matches an uncached engine token-exactly."""
    cfg, weights = model
    sys_prompt = list(range(3, 36))  # 33 tokens -> 2 full blocks

    eng = Engine(
        cfg, weights, num_blocks=64, block_size=16, max_batch=2,
        prefix_cache=True,
    )
    eng.run([sys_prompt + [7]], max_new=3)
    out2 = eng.run([sys_prompt + [9, 11]], max_new=3)
    assert eng.prefix_hits == 1 and eng.prefix_shared_blocks == 2

    fresh = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=2)
    want = fresh.run([sys_prompt + [9, 11]], max_new=3)
    assert out2[0] == want[0]


def test_engine_prefix_cache_eviction_under_pressure(model):
    """Retained pages are evicted LRU when the pool runs dry; serving keeps
    working and stays correct."""
    cfg, weights = model
    eng = Engine(
        cfg, weights, num_blocks=10, block_size=16, max_batch=1,
        max_blocks_per_seq=3, prefix_cache=True,
    )
    fresh_outs = []
    for i in range(6):  # 6 distinct 2-block prompts > 9-block pool
        p = list(range(i * 50 + 1, i * 50 + 20))
        out = eng.run([p], max_new=3)[0]
        f = Engine(cfg, weights, num_blocks=10, block_size=16, max_batch=1,
                   max_blocks_per_seq=3)
        fresh_outs.append(f.run([list(p)], max_new=3)[0])
        assert out == fresh_outs[-1], f"iter {i}: {out}"


def test_engine_n_best_parallel_sampling(model):
    """n-best: one prefill serves n continuations. Children fork the
    parent's page table (shared full blocks), the partial tail block is
    copied on write (cow_last + device page copy), and continuations
    diverge under temperature sampling."""
    cfg, weights = model
    eng = Engine(
        cfg, weights, num_blocks=64, block_size=16, max_batch=4,
        temperature=0.8, seed=7,
    )
    free0 = eng.alloc.num_free
    prompt = list(range(1, 25))  # 24 tokens -> 1 full + 1 partial block
    rids = eng.add_request(prompt, max_new=6, n=3)
    assert len(rids) == 3

    eng.step()  # prefill: samples 3 first tokens, forks + COWs children
    pt = eng.alloc.table(rids[0])
    for crid in rids[1:]:
        ct = eng.alloc.table(crid)
        assert ct[0] == pt[0], "full prefix block must be shared"
        assert ct[1] != pt[1], "partial tail block must be exclusive"
        # the device page copy duplicated the tail block's contents
        for layer in eng.caches:
            for arr in layer.values():
                a = np.asarray(arr)
                np.testing.assert_array_equal(a[:, int(ct[1])], a[:, int(pt[1])])

    while eng.step():
        pass
    outs = [eng.requests[r].out for r in rids]
    assert all(len(o) == 6 for o in outs)
    assert len({tuple(o) for o in outs}) >= 2, f"no divergence: {outs}"
    assert eng.alloc.num_free == free0  # refcounted pages all returned


def test_engine_temperature_seed_advances(model):
    """The sampling seed must advance per step — a fixed seed replays the
    same Gumbel noise and visibly biases generation (e.g. immediate token
    repeats when one noise draw dominates)."""
    cfg, weights = model
    eng = Engine(
        cfg, weights, num_blocks=64, block_size=16, max_batch=1,
        temperature=1.0, seed=3,
    )
    out = eng.run([[1, 2, 3]], max_new=12)[0]
    # with step-invariant noise this sequence degenerates into a loop of
    # length 1 almost surely; distinct-step noise keeps it diverse
    assert len(set(out)) >= 4, f"suspiciously repetitive: {out}"


def test_engine_topk1_equals_greedy(model):
    """topk=1 keeps only the argmax candidate, so temperature sampling
    degenerates to greedy exactly — a deterministic end-to-end check of
    the full-sampler serving path (top-k truncation + Gumbel draw)."""
    cfg, weights = model
    prompts = [[1, 2, 3, 4], [9, 8, 7]]
    greedy = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=2)
    want = greedy.run([list(p) for p in prompts], max_new=5)

    from hpc_ops_tpu.config import SoftmaxPolicy

    eng = Engine(
        cfg, weights, num_blocks=64, block_size=16, max_batch=2,
        temperature=1.0, topk=1, softmax_policy=SoftmaxPolicy.AFTER_TOPK,
    )
    got = eng.run([list(p) for p in prompts], max_new=5)
    assert got == want


def test_engine_repetition_penalty_mask_accumulates(model):
    """The penalty bitmask is seeded with prompt tokens at activation and
    accumulates sampled tokens via the sampler's writeback."""
    cfg, weights = model
    eng = Engine(
        cfg, weights, num_blocks=64, block_size=16, max_batch=2,
        temperature=0.9, topp=0.9, repetition_penalty=1.3, seed=11,
    )
    prompt = [5, 17, 300]
    rid = eng.add_request(list(prompt), max_new=4)
    while eng.step():
        pass
    out = eng.requests[rid].out
    assert len(out) == 4 and all(0 <= t < cfg.vocab for t in out)
    # slot freed on finish; grab the mask row it used
    mask = np.asarray(eng._penalty_mask)
    bits = np.unpackbits(mask, axis=1, bitorder="little")
    hit_rows = {
        r for r in range(bits.shape[0])
        for t in prompt + out[:-1]  # last token sampled, maybe not written back before finish
        if bits[r, t]
    }
    for t in prompt:
        assert bits[:, t].any(), f"prompt token {t} never seeded"
    for t in out:
        assert bits[:, t].any(), f"sampled token {t} never written back"
    assert hit_rows, "no mask row used"


def test_engine_stop_tokens(model):
    """A sampled stop token ends the request early, on every decode path
    (single-step, fused multi-step, speculative)."""
    cfg, weights = model
    prompts = [[1, 2, 3, 4], [9, 8, 7]]
    ref = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=2)
    full = ref.run([list(p) for p in prompts], max_new=8)
    # pick the 3rd token of stream 0 as the stop token
    stop = full[0][2]
    expect0 = full[0][: 3]  # ends WITH the stop token

    for kw in (
        {},
        {"multi_step": 4},
        {"speculative_k": 2},
    ):
        eng = Engine(
            cfg, weights, num_blocks=64, block_size=16, max_batch=2,
            stop_tokens=[stop], **kw,
        )
        outs = eng.run([list(p) for p in prompts], max_new=8)
        assert outs[0] == expect0, f"{kw}: {outs[0]} != {expect0}"
        # stream 1 unaffected unless it also emits the token
        if stop not in full[1]:
            assert outs[1] == full[1], f"{kw}: {outs[1]}"
        assert eng.requests[0].done


def test_engine_stats(model):
    cfg, weights = model
    eng = Engine(
        cfg, weights, num_blocks=64, block_size=16, max_batch=2, multi_step=4
    )
    eng.run([[1, 2, 3], [4, 5]], max_new=8)
    st = eng.stats
    assert st["done"] == 2 and st["tokens_out"] == 16
    assert st["prefill_dispatches"] == 2
    # fused multi-step: 8 tokens = 1 from prefill + 7 decode -> 2 fused runs
    assert st["decode_dispatches"] == 2, st
    assert st["blocks_free"] == st["blocks_total"] - 1  # dummy page held


def test_engine_penalty_slot_pool_grows(model):
    """More queued requests than penalty-mask slots: the pool grows on
    demand instead of failing (prefill runs ahead of decode, so live
    slots are bounded by the queue, not max_batch)."""
    cfg, weights = model
    eng = Engine(
        cfg, weights, num_blocks=128, block_size=16, max_batch=1,
        temperature=0.9, repetition_penalty=1.2, max_blocks_per_seq=2,
    )
    n0 = eng._mask_slots
    prompts = [[i + 1, i + 2] for i in range(n0 + 3)]
    outs = eng.run(prompts, max_new=2)
    assert all(len(o) == 2 for o in outs)
    assert eng._mask_slots > n0  # pool grew


def test_engine_logprobs(model):
    """Per-token logprobs: recorded on every path, one per output token,
    and identical between single-step and fused multi-step greedy (same
    tokens, same logits)."""
    cfg, weights = model
    prompts = [[1, 2, 3, 4], [9, 8]]
    e1 = Engine(
        cfg, weights, num_blocks=64, block_size=16, max_batch=2,
        logprobs=True,
    )
    outs = e1.run([list(p) for p in prompts], max_new=5)
    for rid, out in enumerate(outs):
        lp = e1.requests[rid].logprobs
        assert len(lp) == len(out) == 5
        assert all(v <= 0.0 and np.isfinite(v) for v in lp)

    e2 = Engine(
        cfg, weights, num_blocks=64, block_size=16, max_batch=2,
        logprobs=True, multi_step=3,
    )
    outs2 = e2.run([list(p) for p in prompts], max_new=5)
    assert outs2 == outs
    for rid in range(2):
        np.testing.assert_allclose(
            e1.requests[rid].logprobs, e2.requests[rid].logprobs,
            rtol=2e-3, atol=2e-3,
        )


def test_engine_per_request_sampling_params(model):
    """Mixed-parameter batches: a greedy request served alongside sampled
    requests stays EXACTLY greedy, and per-request topk=1 degenerates to
    greedy too (deterministic cross-check of the tensor-param path)."""
    cfg, weights = model
    prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 5, 6]]
    pure = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=4)
    want = pure.run([list(p) for p in prompts], max_new=5)

    eng = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=4)
    r0 = eng.add_request(list(prompts[0]), max_new=5)  # engine default: greedy
    r1 = eng.add_request(list(prompts[1]), max_new=5, temperature=1.0)
    r2 = eng.add_request(list(prompts[2]), max_new=5, temperature=1.0, topk=1)
    while eng.step():
        pass
    assert eng.requests[r0].out == want[0]  # greedy row untouched by batch
    assert eng.requests[r2].out == want[2]  # topk=1 == greedy, exactly
    assert len(eng.requests[r1].out) == 5
    assert all(0 <= t < cfg.vocab for t in eng.requests[r1].out)


def test_engine_cancel(model):
    """Cancel drops a request mid-flight and frees its pages; the rest of
    the batch is unaffected (token-identical to serving it alone)."""
    cfg, weights = model
    solo = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=2)
    want = solo.run([[1, 2, 3]], max_new=6)[0]

    eng = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=2)
    free0 = eng.alloc.num_free
    keep = eng.add_request([1, 2, 3], max_new=6)
    kill = eng.add_request([7, 8, 9, 10], max_new=6)
    eng.step(); eng.step()  # both prefilled
    eng.step()  # one decode batch
    eng.cancel(kill)
    while eng.step():
        pass
    assert eng.requests[keep].out == want
    assert eng.requests[kill].done
    assert len(eng.requests[kill].out) < 6
    assert eng.alloc.num_free == free0  # cancelled pages returned

    # cancelling a pending (never-prefilled) request is clean too
    r3 = eng.add_request([5, 6], max_new=4)
    eng.cancel(r3)
    assert not eng.step()  # nothing left to do
    assert eng.alloc.num_free == free0
