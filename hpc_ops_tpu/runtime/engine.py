"""Minimal continuous-batching serving engine.

The reference is an operator library that plugs into vLLM/SGLang
(README.md:36-38); a complete framework carries the serving loop itself.
This engine is that glue: paged-KV block management (native allocator),
bucketed prefill, dynamically batched decode over a fixed-shape jitted
step, and fused sampling — all built on the ops in :mod:`hpc_ops_tpu.ops`.

Shape policy (XLA compiles static shapes): prefill pads each prompt to a
power-of-two bucket; decode always runs the full ``max_batch`` with dummy
slots parked on a reserved page, so the engine compiles one prefill step
per bucket plus exactly one decode step.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from hpc_ops_tpu.models.llama import (
    ModelConfig,
    decode_multi,
    forward_step,
    init_cache,
)
from hpc_ops_tpu.runtime import PagedBlockAllocator

__all__ = ["Engine", "Request", "ngram_draft"]


def ngram_draft(tokens: list, k: int, n: int = 2) -> list:
    """Prompt-lookup drafter: find the latest earlier occurrence of the
    final n-gram in the request's own history and propose the k tokens that
    followed it (the no-extra-model speculative scheme; pairs with the
    reference's MTP draft support in decode attention, entry.cc:429, and
    the sampler's draft masking, sampler.h:28-42). Returns [] when the
    n-gram has no earlier match — the caller falls back to plain decode.
    """
    if len(tokens) <= n:
        return []
    tail = tokens[-n:]
    # scan right-to-left over earlier positions
    for s in range(len(tokens) - n - 1, -1, -1):
        if tokens[s : s + n] == tail:
            cand = tokens[s + n : s + n + k]
            if cand:
                return list(cand)
    return []


@dataclass
class Request:
    rid: int
    prompt: list
    out: list = field(default_factory=list)
    max_new: int = 16
    done: bool = False
    prefilled: int = 0  # prompt tokens already written to the KV cache
    n_best: int = 1  # parallel samples sharing this prompt's KV (parent)
    parent: int | None = None  # set on n-best children
    stop: frozenset = frozenset()  # sampling any of these ends the request
    logprobs: list = field(default_factory=list)  # per-out-token, if enabled
    # per-request sampling overrides (None -> engine defaults)
    temperature: float | None = None
    topk: int | None = None
    topp: float | None = None

    @property
    def tokens(self) -> list:
        return self.prompt + self.out


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class Engine:
    """Continuous-batching engine over one model + one paged cache pool."""

    def __init__(
        self,
        cfg: ModelConfig,
        weights,
        *,
        num_blocks: int = 128,
        block_size: int = 16,
        max_batch: int = 8,
        max_blocks_per_seq: int | None = None,
        temperature: float = 0.0,
        seed: int = 0,
        topk: int = 0,
        topp: float = 0.0,
        softmax_policy=None,
        repetition_penalty: float = 0.0,
        speculative_k: int = 0,
        draft_fn=None,
        prefill_chunk: int | None = None,
        multi_step: int = 1,
        prefix_cache: bool = False,
        stop_tokens=(),
        logprobs: bool = False,
    ):
        self.cfg = cfg
        self.weights = weights
        self.block_size = block_size
        self.max_batch = max_batch
        self.temperature = temperature
        self.seed = seed
        # speculative decode (greedy verification is lossless; see
        # speculative_stats)
        assert speculative_k == 0 or temperature <= 0.0, (
            "speculative decode currently requires greedy sampling"
        )
        assert speculative_k < block_size, "draft run must fit one page"
        self.speculative_k = speculative_k
        self.draft_fn = draft_fn or ngram_draft
        # chunked prefill: long prompts prefill prefill_chunk tokens per
        # engine step, and decode batches interleave between chunks, so one
        # long prompt cannot stall token generation for the active requests
        # (incremental prefill is numerically identical to one-shot prefill;
        # tests/test_model.py::test_decode_matches_incremental_prefill).
        assert prefill_chunk is None or prefill_chunk > 0
        self.prefill_chunk = prefill_chunk
        self._prefer_decode = False
        # fused multi-step decode: multi_step decode iterations run in ONE
        # compiled graph (models.llama.decode_multi) — in-graph sampling +
        # cache append, no host round trip between steps. Token streams are
        # identical to single-step for greedy sampling; temperature>0 draws
        # per-step folded-key noise (a different, equally valid stream than
        # the host fused_sampler path). Page tables reserve multi_step-1
        # slack slots per request (see add_request).
        assert multi_step >= 1
        assert multi_step == 1 or speculative_k == 0, (
            "fused multi-step decode and speculative decode are exclusive"
        )
        self.multi_step = multi_step
        # prefix caching: a new request whose prompt starts with blocks
        # already WRITTEN for another request (live or recently finished)
        # shares those physical pages (allocator refcounts; see
        # share_prefix) and prefills only the suffix. Finished requests'
        # pages are retained in LRU order and evicted on pool pressure.
        # Only full, fully-written blocks are shared and each request's own
        # writes always land in unshared tail blocks, so shared pages are
        # read-only and outputs stay token-identical (incremental-prefill
        # exactness).
        self.prefix_cache = prefix_cache
        # stop tokens (EOS and friends): a request finishes as soon as it
        # emits one, before exhausting max_new; overridable per request
        self.stop_tokens = frozenset(map(int, stop_tokens))
        # per-token log-softmax of each sampled token, stored on the
        # Request (standard serving API surface); speculative decode emits
        # tokens without a full per-token distribution pass, so the two
        # are exclusive
        assert not (logprobs and speculative_k > 0)
        self.logprobs = logprobs
        self._retired: list[int] = []  # finished rids, pages retained (LRU)
        self._resident: set[int] = set()  # rids holding allocator tables
        self._bh_cache: dict[int, tuple[int, list]] = {}  # rid -> block hashes
        self.prefix_hits = 0
        self.prefix_shared_blocks = 0
        self._children: dict[int, list[int]] = {}  # n-best parent -> kids
        self._sample_calls = 0
        self._copy_page_fn = None
        self._prefill_dispatches = 0
        self._decode_dispatches = 0
        # full-sampler serving (reference op #16 semantics): top-k/top-p
        # truncation and the repetition-penalty bitmask, all inside
        # fused_sampler. Each live request owns a mask row (slot); prompt
        # tokens are seeded into it at activation, sampled tokens
        # accumulate via the sampler's functional writeback.
        from hpc_ops_tpu.config import SoftmaxPolicy

        self.topk = topk
        self.topp = topp
        self.repetition_penalty = repetition_penalty
        if softmax_policy is None:
            softmax_policy = (
                SoftmaxPolicy.BEFORE_TOPK if topp > 0 else SoftmaxPolicy.NONE
            )
        self.softmax_policy = softmax_policy
        self._full_sampler = (
            topk > 0 or topp > 0 or repetition_penalty > 0
        )
        assert not (self._full_sampler and temperature <= 0.0), (
            "topk/topp/repetition_penalty require temperature > 0"
        )
        assert not (self._full_sampler and multi_step > 1), (
            "full-sampler features run the host sampler; use multi_step=1"
        )
        if repetition_penalty > 0:
            self._mask_slots = max_batch * 8 + 1  # last row = dummy scratch
            self._penalty_mask = jnp.zeros(
                (self._mask_slots, (cfg.vocab + 7) // 8), jnp.uint8
            )
            self._free_slots = list(range(self._mask_slots - 1))
            self._slot_of: dict[int, int] = {}
        self.spec_proposed = 0
        self.spec_accepted = 0
        self._spec_step = None
        self.alloc = PagedBlockAllocator(num_blocks, block_size)
        self.caches = init_cache(cfg, num_blocks=num_blocks, block_size=block_size)
        self.max_blocks_per_seq = max_blocks_per_seq or max(num_blocks // 4, 4)
        # reserved page for dummy decode slots (never read back)
        self._dummy_seq = -1
        self.alloc.extend(self._dummy_seq, 1)
        self._dummy_block = int(self.alloc.table(self._dummy_seq)[0])
        self.requests: dict[int, Request] = {}
        self._pending: list[int] = []
        self._active: list[int] = []
        self._next_rid = 0

        self._prefill_steps: dict[int, object] = {}
        self._decode_step = jax.jit(
            functools.partial(
                forward_step,
                cfg=cfg,
                is_prefill=False,
                max_seqlens_q=1,
            ),
            static_argnames=(),
        )
        self._decode_multi_step = (
            jax.jit(
                functools.partial(
                    decode_multi,
                    cfg=cfg,
                    num_steps=multi_step,
                    temperature=temperature,
                    return_logprobs=logprobs,
                )
            )
            if multi_step > 1
            else None
        )

    # ------------------------------------------------------------- requests
    def add_request(self, prompt_ids, max_new: int = 16, n: int = 1,
                    stop=None, temperature=None, topk=None, topp=None):
        """Queue a request. With ``n > 1`` (parallel sampling / n-best,
        requires temperature > 0): one prefill serves n continuations — the
        children fork the parent's page table (allocator refcounts) and the
        shared partial tail block is copied on write (cow_last + a device
        page copy), so only divergent KV is ever duplicated. Returns the
        rid (n == 1) or the list of n rids (parent first)."""
        assert n >= 1
        eff_temp = self.temperature if temperature is None else temperature
        assert n == 1 or eff_temp > 0.0, (
            "n-best sampling requires temperature > 0 (greedy continuations "
            "would be identical)"
        )
        assert n == 1 or self.speculative_k == 0
        if temperature is not None or topk is not None or topp is not None:
            # per-request params run through the host sampler each step
            assert self.multi_step == 1, (
                "per-request sampling params require multi_step=1 (the "
                "fused graph bakes the engine-level sampler in)"
            )
            assert self.speculative_k == 0
            assert self.repetition_penalty == 0.0 or eff_temp > 0.0
        # reject up front anything whose KV footprint cannot fit the per-seq
        # page-table width: over-long requests would otherwise fail deep in
        # a decode batch with an opaque broadcast error after KV was already
        # allocated (tables[i] = self._table(rid) below).
        need = len(prompt_ids) + max_new + self.speculative_k + (
            self.multi_step - 1
        )
        cap = self.max_blocks_per_seq * self.block_size
        if need > cap:
            raise ValueError(
                f"request needs {need} KV slots (prompt {len(prompt_ids)} + "
                f"max_new {max_new}) but max_blocks_per_seq="
                f"{self.max_blocks_per_seq} x block_size={self.block_size} "
                f"caps a sequence at {cap}"
            )
        stop_set = (
            self.stop_tokens if stop is None else frozenset(map(int, stop))
        )
        rid = self._next_rid
        self._next_rid += 1
        prompt = list(map(int, prompt_ids))
        self.requests[rid] = Request(
            rid, prompt, max_new=max_new, n_best=n, stop=stop_set,
            temperature=temperature, topk=topk, topp=topp,
        )
        self._pending.append(rid)
        if n == 1:
            return rid
        rids = [rid]
        for _ in range(n - 1):
            crid = self._next_rid
            self._next_rid += 1
            # children are NOT pending — the parent's prefill activates them
            self.requests[crid] = Request(
                crid, list(prompt), max_new=max_new, parent=rid,
                stop=stop_set, temperature=temperature, topk=topk, topp=topp,
            )
            rids.append(crid)
        self._children[rid] = rids[1:]
        return rids

    def cancel(self, rid: int) -> None:
        """Abort a request: drop it from scheduling and release its KV
        pages (n-best children of a cancelled parent are cancelled too if
        still pending activation)."""
        req = self.requests.get(rid)
        if req is None or req.done:
            return
        req.done = True
        if rid in self._pending:
            self._pending.remove(rid)
        if rid in self._active:
            self._active.remove(rid)
        for kid in self._children.pop(rid, []):
            self.requests[kid].done = True
        if rid in self._resident:
            self.alloc.free(rid)
            self._resident.discard(rid)
            self._bh_cache.pop(rid, None)
        if self.repetition_penalty > 0:
            s = self._slot_of.pop(rid, None)
            if s is not None:
                self._free_slots.append(s)

    # --------------------------------------------------------------- steps
    def _lp_of(self, logits, toks) -> np.ndarray:
        """log-softmax of each sampled token, [rows] float."""
        lsm = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1)
        lp = jnp.take_along_axis(
            lsm, jnp.asarray(toks, jnp.int32)[:, None], axis=-1
        )
        return np.asarray(lp).reshape(-1)

    def _assign_slot(self, rid: int) -> int:
        """Give `rid` a penalty-mask row seeded with its prompt tokens."""
        if rid in self._slot_of:
            return self._slot_of[rid]
        if not self._free_slots:
            # grow the pool: prefill runs ahead of decode, so the number of
            # live slots is bounded by queued requests, not max_batch.
            # The scratch row stays LAST (its id is recomputed per sample
            # call); the old scratch row becomes a data row — rows are
            # fully re-seeded on assignment, so its stale bits are inert.
            old = self._penalty_mask
            n_old = self._mask_slots
            n_new = (n_old - 1) * 2 + 1
            self._penalty_mask = (
                jnp.zeros((n_new, old.shape[1]), old.dtype)
                .at[: n_old - 1]
                .set(old[: n_old - 1])
            )
            self._free_slots = list(range(n_old - 1, n_new - 1))
            self._mask_slots = n_new
        s = self._free_slots.pop()
        self._slot_of[rid] = s
        row = np.zeros(self._penalty_mask.shape[1], np.uint8)
        for t in self.requests[rid].prompt:
            row[t // 8] |= np.uint8(1 << (t % 8))
        self._penalty_mask = self._penalty_mask.at[s].set(jnp.asarray(row))
        return s

    def _sample(self, logits, rids=None) -> np.ndarray:
        b = logits.shape[0]
        rows = list(rids or [])[:b] + [None] * (b - len(rids or []))

        def pv(field, default):
            out = []
            for r in rows:
                v = getattr(self.requests[r], field) if r is not None else None
                out.append(default if v is None else v)
            return out

        temps = np.asarray(pv("temperature", self.temperature), np.float32)
        greedy = temps <= 0.0
        if greedy.all():
            return np.asarray(jnp.argmax(logits, axis=-1)).astype(np.int64)
        from hpc_ops_tpu.config import SoftmaxPolicy
        from hpc_ops_tpu.ops.sampler import fused_sampler

        # fold a step counter into the seed: a fixed seed would replay the
        # SAME Gumbel noise every decode step, systematically biasing
        # generation toward whatever tokens that one draw favors
        self._sample_calls += 1
        seed = (self.seed + 0x9E3779B9 * self._sample_calls) % (2**31)
        topks = pv("topk", self.topk)
        topps = pv("topp", self.topp)
        use_topk = any(topks)
        use_topp = any(t > 0 for t in topps)
        kw = {}
        if self._full_sampler or use_topk or use_topp:
            policy = self.softmax_policy
            if use_topp and policy == SoftmaxPolicy.NONE:
                policy = SoftmaxPolicy.BEFORE_TOPK
            # a tensor param counts as "enabled" in the sampler even when
            # all-zero — pass scalars for unused knobs
            kw.update(
                topk=jnp.asarray(topks, jnp.int32) if use_topk else 0,
                topp=jnp.asarray(topps, jnp.float32) if use_topp else 0.0,
                softmax_policy=policy,
            )
            if self.repetition_penalty > 0:
                scratch = self._mask_slots - 1
                slots = [
                    self._assign_slot(r) if r is not None else scratch
                    for r in rows
                ]
                kw.update(
                    penalty_mask=self._penalty_mask,
                    slot_id=jnp.asarray(slots, jnp.int32),
                    repetition_penalty=self.repetition_penalty,
                )
        # greedy rows run through the sampler at temp=1 (tensor temps must
        # be > 0) and are overwritten with the exact argmax below
        toks, new_mask = fused_sampler(
            logits,
            temperature=jnp.asarray(np.where(greedy, 1.0, temps), jnp.float32),
            seed=seed,
            **kw,
        )
        if new_mask is not None:
            self._penalty_mask = new_mask
        out = np.asarray(toks).reshape(-1)
        if greedy.any():
            am = np.asarray(jnp.argmax(logits, axis=-1)).reshape(-1)
            out = np.where(greedy, am, out)
        return out.astype(np.int64)

    def _prefill_fn(self, bucket: int):
        if bucket not in self._prefill_steps:
            self._prefill_steps[bucket] = jax.jit(
                functools.partial(
                    forward_step,
                    cfg=self.cfg,
                    is_prefill=True,
                    max_seqlens_q=bucket,
                )
            )
        return self._prefill_steps[bucket]

    def _table(self, rid: int) -> np.ndarray:
        return self.alloc.table(rid, pad_to=self.max_blocks_per_seq)

    # ------------------------------------------------------- prefix caching
    def _extend(self, rid: int, num_tokens: int) -> None:
        """alloc.extend with LRU eviction of retained finished-request
        pages on pool pressure (shared pages survive via refcounts)."""
        self._resident.add(rid)
        while True:
            try:
                self.alloc.extend(rid, num_tokens)
                return
            except MemoryError:
                if not self._retired:
                    raise
                old = self._retired.pop(0)
                self.alloc.free(old)
                self._resident.discard(old)
                self._bh_cache.pop(old, None)

    def _written(self, rid: int) -> list:
        """Tokens actually present in rid's KV pages: the prefilled prompt
        prefix while prefilling; everything but the last sampled token
        once decoding (that token was sampled but never fed back)."""
        req = self.requests[rid]
        if not req.out:
            return req.prompt[: req.prefilled]
        return req.tokens[:-1]

    def _block_hashes(self, tokens: list, nfull: int) -> list:
        """Cumulative hash per full block: h_i = hash(h_{i-1}, block_i)."""
        hs, h = [], 0
        bs = self.block_size
        for i in range(nfull):
            h = hash((h, tuple(tokens[i * bs : (i + 1) * bs])))
            hs.append(h)
        return hs

    def _resident_hashes(self, rid: int) -> list:
        """Cached cumulative block hashes of rid's written tokens
        (recomputed only when its written-block count changes)."""
        w = self._written(rid)
        nfull = len(w) // self.block_size
        cached = self._bh_cache.get(rid)
        if cached is not None and cached[0] == nfull:
            return cached[1]
        hs = self._block_hashes(w, nfull)
        self._bh_cache[rid] = (nfull, hs)
        return hs

    def _match_prefix(self, prompt: list) -> tuple[int | None, int]:
        """Longest full-block prefix of `prompt` already written for a
        resident request, via cached cumulative block hashes (O(blocks)
        per candidate; token equality re-verified on the winner to guard
        hash collisions). Sharing is capped at len(prompt)-1 tokens so the
        suffix prefill always has at least one token (and therefore
        produces the first-token logits)."""
        bs = self.block_size
        cap_blocks = (len(prompt) - 1) // bs
        if cap_blocks <= 0:
            return None, 0
        want = self._block_hashes(prompt, cap_blocks)
        best, best_k = None, 0
        for cand in self._resident:
            if cand == self._dummy_seq or cand not in self.requests:
                continue
            have = self._resident_hashes(cand)
            lim = min(len(have), cap_blocks)
            k = 0
            while k < lim and have[k] == want[k]:
                k += 1
            if k > best_k:
                best, best_k = cand, k
        if best is not None:
            # hash-collision guard: verify the actual tokens of the winner
            w = self._written(best)
            while best_k and (
                w[: best_k * bs] != prompt[: best_k * bs]
            ):
                best_k -= 1
            if best_k == 0:
                best = None
        return best, best_k

    def _prefill_one(self, rid: int) -> bool:
        """Prefill the next chunk of `rid`'s prompt (the whole prompt when
        chunking is off). Returns True when the prompt is fully prefilled
        — only then is the first token sampled and the request activated."""
        req = self.requests[rid]
        total = len(req.prompt)
        if self.prefix_cache and req.prefilled == 0 and rid not in self._resident:
            parent, k = self._match_prefix(req.prompt)
            if k > 0:
                self.alloc.share_prefix(parent, rid, k)
                self._resident.add(rid)
                req.prefilled = k * self.block_size
                self.prefix_hits += 1
                self.prefix_shared_blocks += k
        start = req.prefilled
        n = total - start
        if self.prefill_chunk is not None:
            n = min(self.prefill_chunk, n)
        bucket = _bucket(n)
        self._extend(rid, start + n)  # extend() takes TOTAL tokens
        tbl = self._table(rid)
        tokens = np.zeros((bucket,), np.int32)
        tokens[:n] = req.prompt[start : start + n]
        logits, self.caches = self._prefill_fn(bucket)(
            self.weights,
            self.caches,
            token_ids=jnp.asarray(tokens),
            seq_lens=jnp.asarray([start + n], jnp.int32),
            q_index=jnp.asarray([0, n], jnp.int32),
            block_ids=jnp.asarray(tbl[None, :]),
        )
        req.prefilled = start + n
        if req.prefilled < total:
            return False
        nb = req.n_best
        if nb == 1:
            tok = int(self._sample(logits.reshape(1, -1), rids=[rid])[0])
            req.out.append(tok)
            if self.logprobs:
                req.logprobs.append(
                    float(self._lp_of(logits.reshape(1, -1), [tok])[0])
                )
            self._active.append(rid)
            self._finish_if_done(req)
            return True
        # n-best: one prefill, n continuations. Sample n first tokens from
        # the same logits row (per-row Gumbel noise makes them distinct),
        # fork the children's page tables off the parent's, and make each
        # child's partial tail block exclusive (cow + device page copy) so
        # subsequent decode writes diverge without touching shared pages.
        kids = self._children.pop(rid)
        toks = self._sample(
            jnp.broadcast_to(logits.reshape(1, -1), (nb, logits.size)),
            rids=[rid] + kids,
        )
        req.out.append(int(toks[0]))
        lps = (
            self._lp_of(
                jnp.broadcast_to(logits.reshape(1, -1), (nb, logits.size)),
                toks,
            )
            if self.logprobs
            else None
        )
        if lps is not None:
            req.logprobs.append(float(lps[0]))
        self._active.append(rid)
        self._finish_if_done(req)
        for j, crid in enumerate(kids, start=1):
            child = self.requests[crid]
            self.alloc.fork(rid, crid)
            self._resident.add(crid)
            child.prefilled = total
            if total % self.block_size:
                self._cow_last(crid)
            child.out.append(int(toks[j]))
            if lps is not None:
                child.logprobs.append(float(lps[j]))
            self._active.append(crid)
            self._finish_if_done(child)
        return True

    def _cow_last(self, rid: int) -> None:
        """Make rid's tail block exclusive; device-copies the old page's
        contents into the fresh page across all cache layers."""
        while True:
            try:
                blk, src = self.alloc.cow_last(rid)
                break
            except MemoryError:
                if not self._retired:
                    raise
                old = self._retired.pop(0)
                self.alloc.free(old)
                self._resident.discard(old)
                self._bh_cache.pop(old, None)
        if src < 0:
            return  # already exclusive
        if self._copy_page_fn is None:
            def copy_one(v, s, d):
                # page dim: 0 for the slot-leading NHD_FUSED slab (3-D),
                # 1 for HND k/v pairs and head-major fused slabs (4-D)
                if v.ndim == 3:
                    return v.at[d].set(v[s])
                return v.at[:, d].set(v[:, s])

            def copy(caches, s, d):
                return [
                    {k: copy_one(v, s, d) for k, v in layer.items()}
                    for layer in caches
                ]

            self._copy_page_fn = jax.jit(copy)
        self.caches = self._copy_page_fn(
            self.caches, jnp.int32(src), jnp.int32(blk)
        )

    def _finish_if_done(self, req: Request) -> None:
        if req.done:
            return  # idempotent: callers may re-check after batch loops
        if len(req.out) >= req.max_new or (
            req.out and req.out[-1] in req.stop
        ):
            req.done = True
            if req.rid in self._active:
                self._active.remove(req.rid)
            if self.prefix_cache:
                # retain the pages for future prefix hits; evicted LRU by
                # _extend under pool pressure
                self._retired.append(req.rid)
            else:
                self.alloc.free(req.rid)
                self._resident.discard(req.rid)
                self._bh_cache.pop(req.rid, None)
            if self.repetition_penalty > 0:
                s = self._slot_of.pop(req.rid, None)
                if s is not None:
                    self._free_slots.append(s)  # row re-seeded on reuse

    def _decode_batch(self) -> None:
        rids = self._active[: self.max_batch]
        b = self.max_batch
        tokens = np.zeros((b,), np.int32)
        seq_lens = np.ones((b,), np.int32)
        tables = np.full((b, self.max_blocks_per_seq), self._dummy_block, np.int32)
        for i, rid in enumerate(rids):
            req = self.requests[rid]
            new_len = len(req.tokens)
            self._extend(rid, new_len)
            tokens[i] = req.tokens[-1]
            seq_lens[i] = new_len
            tables[i] = self._table(rid)
        logits, self.caches = self._decode_step(
            self.weights,
            self.caches,
            token_ids=jnp.asarray(tokens),
            seq_lens=jnp.asarray(seq_lens),
            q_index=jnp.arange(b + 1, dtype=jnp.int32),
            block_ids=jnp.asarray(tables),
        )
        toks = self._sample(logits, rids=rids)
        lps = self._lp_of(logits, toks) if self.logprobs else None
        for i, rid in enumerate(rids):
            req = self.requests[rid]
            req.out.append(int(toks[i]))
            if lps is not None:
                req.logprobs.append(float(lps[i]))
            self._finish_if_done(req)

    def _decode_batch_multi(self) -> None:
        """One fused multi_step-step decode dispatch (decode_multi): the
        batch membership is fixed for the whole fused run; requests that
        hit max_new mid-run have their surplus tokens truncated (their
        page-table slack covers the surplus KV writes)."""
        n = self.multi_step
        rids = self._active[: self.max_batch]
        b = self.max_batch
        tokens = np.zeros((b,), np.int32)
        seq_lens = np.ones((b,), np.int32)
        tables = np.full((b, self.max_blocks_per_seq), self._dummy_block, np.int32)
        for i, rid in enumerate(rids):
            req = self.requests[rid]
            new_len = len(req.tokens)
            self._extend(rid, new_len + n - 1)
            tokens[i] = req.tokens[-1]
            seq_lens[i] = new_len
            tables[i] = self._table(rid)
        # per-run seed (traced, so no recompile): a fixed seed would replay
        # identical per-step noise across fused runs
        self._sample_calls += 1
        toks, self.caches = self._decode_multi_step(
            self.weights,
            self.caches,
            last_tokens=jnp.asarray(tokens),
            seq_lens=jnp.asarray(seq_lens),
            block_ids=jnp.asarray(tables),
            sample_seed=jnp.int32(
                (self.seed + 0x9E3779B9 * self._sample_calls) % (2**31)
            ),
        )
        if self.logprobs:
            toks, lps = toks
            lps = np.asarray(lps)  # [n, b]
        else:
            lps = None
        toks = np.asarray(toks)  # [n, b]
        for i, rid in enumerate(rids):
            req = self.requests[rid]
            for j, t in enumerate(toks[:, i]):
                if req.done or len(req.out) >= req.max_new:
                    break
                req.out.append(int(t))
                if lps is not None:
                    req.logprobs.append(float(lps[j, i]))
                self._finish_if_done(req)
            self._finish_if_done(req)

    # ------------------------------------------------- speculative decode
    def _spec_fn(self):
        if self._spec_step is None:
            self._spec_step = jax.jit(
                functools.partial(
                    forward_step,
                    cfg=self.cfg,
                    is_prefill=False,
                    mtp=self.speculative_k,
                    max_seqlens_q=1,
                    return_all_logits=True,
                )
            )
        return self._spec_step

    def _spec_batch(self, drafts: dict) -> None:
        """One MTP verification step: run [last, d1..dk] per request through
        the decode path (sq = k+1 draft rows, reference entry.cc:429-434),
        greedily accept the longest prefix of drafts the model agrees with,
        and emit one correction token. Greedy verification is lossless —
        outputs are bit-identical to plain decode. Rejected drafts leave
        stale KV beyond the committed length; attention masks by seq_len
        and later steps overwrite those slots."""
        k = self.speculative_k
        sq = k + 1
        rids = self._active[: self.max_batch]
        b = self.max_batch
        tokens = np.zeros((b, sq), np.int32)
        seq_lens = np.full((b,), sq, np.int32)  # dummy rows: positions 0..k
        tables = np.full((b, self.max_blocks_per_seq), self._dummy_block, np.int32)
        for i, rid in enumerate(rids):
            req = self.requests[rid]
            base = len(req.tokens)
            d = (drafts[rid] + [0] * k)[:k]
            tokens[i, 0] = req.tokens[-1]
            tokens[i, 1:] = d
            seq_lens[i] = base + k
            self._extend(rid, base + k)
            tables[i] = self._table(rid)
        logits, self.caches = self._spec_fn()(
            self.weights,
            self.caches,
            token_ids=jnp.asarray(tokens.reshape(-1)),
            seq_lens=jnp.asarray(seq_lens),
            q_index=jnp.arange(b + 1, dtype=jnp.int32) * sq,
            block_ids=jnp.asarray(tables),
        )
        targets = np.asarray(jnp.argmax(logits, axis=-1)).reshape(b, sq)
        for i, rid in enumerate(rids):
            req = self.requests[rid]
            d = drafts[rid]
            a = 0
            while a < len(d) and d[a] == targets[i, a]:
                a += 1
            emitted = list(d[:a]) + [int(targets[i, a])]
            self.spec_proposed += len(d)
            self.spec_accepted += a
            for t in emitted:
                if req.done or len(req.out) >= req.max_new:
                    break
                req.out.append(int(t))
                self._finish_if_done(req)
            self._finish_if_done(req)

    @property
    def speculative_stats(self) -> dict:
        return {
            "proposed": self.spec_proposed,
            "accepted": self.spec_accepted,
            "acceptance": (
                self.spec_accepted / self.spec_proposed
                if self.spec_proposed
                else 0.0
            ),
        }

    @property
    def stats(self) -> dict:
        """Serving counters: dispatches, tokens, occupancy, cache state."""
        done = [r for r in self.requests.values() if r.done]
        return {
            "requests": len(self.requests),
            "pending": len(self._pending),
            "active": len(self._active),
            "done": len(done),
            "tokens_out": sum(len(r.out) for r in self.requests.values()),
            "prefill_dispatches": self._prefill_dispatches,
            "decode_dispatches": self._decode_dispatches,
            "blocks_free": self.alloc.num_free,
            "blocks_total": self.alloc.num_blocks,
            "prefix_hits": self.prefix_hits,
            "prefix_shared_blocks": self.prefix_shared_blocks,
            "speculative": self.speculative_stats,
        }

    def step(self) -> bool:
        """One engine step (a prefill [chunk] or a decode batch). Returns
        False when no work remains. With chunked prefill enabled, decode
        batches alternate with prefill chunks so active requests keep
        producing tokens while a long prompt streams in."""
        if self._pending and not (
            self.prefill_chunk is not None and self._active and self._prefer_decode
        ):
            self._prefill_dispatches += 1
            if self._prefill_one(self._pending[0]):
                self._pending.pop(0)
            self._prefer_decode = True
            return True
        self._prefer_decode = False
        if self._active:
            self._decode_dispatches += 1
            if self.speculative_k > 0:
                drafts = {
                    rid: self.draft_fn(
                        self.requests[rid].tokens, self.speculative_k
                    )
                    for rid in self._active[: self.max_batch]
                }
                if any(drafts.values()):
                    self._spec_batch(drafts)
                    return True
            if self.multi_step > 1:
                self._decode_batch_multi()
            else:
                self._decode_batch()
            return True
        return False

    def run(self, prompts, max_new: int = 8) -> list:
        """Convenience: serve `prompts` to completion, return token lists."""
        rids = [self.add_request(p, max_new=max_new) for p in prompts]
        while self.step():
            pass
        return [self.requests[r].out for r in rids]
