"""Multi-host / multi-chip continuous-batching engine.

BASELINE config 5: a model TP-sharded within each host over ICI, with
request rows (and their KV page pools) sharded across hosts/slices over the
mesh's row axes ("ddp" DCN x "dp" ICI, from ``make_hybrid_mesh``), and
continuous batching across all row shards. The reference has no multi-node
story (its communicator is single-node NVLink, SURVEY.md §2.2); this is
TPU-native headroom: one jitted shard_map step serves every host, XLA
routes the per-layer fused allreduce+norm over ICI only, and nothing
crosses DCN during a step except what the row sharding already placed
locally.

Scheduling model: each row shard owns ``max_batch`` decode slots and a
shard-local page pool (a :class:`PagedBlockAllocator` per shard). Incoming
requests are assigned to the least-loaded shard. Every engine step runs ONE
global program: either a decode step over all shards' slots, or a prefill
step (one request per shard, same length bucket — shards without pending
work run a dummy row). Token rows move host<->device as tiny int32 arrays;
weights and caches never leave the mesh.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from hpc_ops_tpu.models.llama import (
    ModelConfig,
    init_cache,
    make_sharded_multi_step,
    make_sharded_step,
    shard_weights_for_tp,
    shard_weights_specs,
)
from hpc_ops_tpu.runtime import PagedBlockAllocator
from hpc_ops_tpu.runtime.engine import Request, _bucket

__all__ = ["ShardedEngine"]


class ShardedEngine:
    """Continuous batching over a (…row axes…, "tp") mesh."""

    def __init__(
        self,
        cfg: ModelConfig,
        weights,
        mesh,
        *,
        num_blocks: int = 128,  # per row shard
        block_size: int = 16,
        max_batch: int = 4,  # decode slots per row shard
        max_blocks_per_seq: int | None = None,
        prefill_chunk: int | None = None,
        multi_step: int = 1,
        stop_tokens=(),
        logprobs: bool = False,
        temperature: float = 0.0,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.mesh = mesh
        self.tp = mesh.shape["tp"]
        self.row_axes = tuple(a for a in mesh.axis_names if a != "tp")
        self.num_shards = int(np.prod([mesh.shape[a] for a in self.row_axes]))
        self.block_size = block_size
        self.max_batch = max_batch
        # chunked prefill (same semantics as Engine): long prompts stream in
        # prefill_chunk tokens per global prefill round, decode rounds
        # interleave between chunks, and a mid-prefill request stays pinned
        # to the shard that took its first chunk (its KV pages are
        # shard-local).
        assert prefill_chunk is None or prefill_chunk > 0
        self.prefill_chunk = prefill_chunk
        self._prefer_decode = False
        # fused multi-step decode over the mesh (make_sharded_multi_step):
        # same semantics as Engine(multi_step=N) — N-1 page-table slack per
        # request, fixed batch per fused run, surplus tokens truncated.
        assert multi_step >= 1
        self.multi_step = multi_step
        self.stop_tokens = frozenset(map(int, stop_tokens))
        self.logprobs = logprobs
        self.temperature = temperature
        self.seed = seed
        self._sample_calls = 0
        self.num_blocks = num_blocks
        self.max_blocks_per_seq = max_blocks_per_seq or max(num_blocks // 4, 4)

        rows = self.row_axes if len(self.row_axes) > 1 else self.row_axes[0]
        self._rows_spec = P(rows)
        wspecs = shard_weights_specs(cfg)
        w_repacked = shard_weights_for_tp(weights, cfg, self.tp)
        # map over the SPEC tree (P is a tuple subclass, so it must be the
        # is_leaf-controlled first tree) to commit weights onto the mesh once
        self.weights = jax.tree.map(
            lambda s, x: jax.device_put(x, NamedSharding(mesh, s)),
            wspecs,
            w_repacked,
            is_leaf=lambda x: isinstance(x, P),
        )
        # caches: global page pool = per-shard pool x num_shards along the
        # blocks dim; kv heads sharded over tp
        caches = init_cache(
            cfg, num_blocks=num_blocks * self.num_shards, block_size=block_size
        )
        # kv heads over tp, page-pool dim over the row axes. Split k/v
        # caches are head-leading 4-D [Hkv, nb, bs, D]; the int8 NHD_FUSED
        # slab is slot-leading 3-D [nb, 2*bs, Hkv*D] (heads live in the
        # lane dim).
        def cache_part(v):
            return P(rows, None, "tp") if v.ndim == 3 else P("tp", rows)

        self.caches = [
            {k: jax.device_put(v, NamedSharding(mesh, cache_part(v)))
             for k, v in layer.items()}
            for layer in caches
        ]

        # one allocator + slot table per row shard; block ids are
        # SHARD-LOCAL (each shard's pool is its slice of the blocks dim)
        self.allocs = [
            PagedBlockAllocator(num_blocks, block_size)
            for _ in range(self.num_shards)
        ]
        self._dummy_blocks = []
        for a in self.allocs:
            a.extend(-1, 1)
            self._dummy_blocks.append(int(a.table(-1)[0]))

        self.requests: dict[int, Request] = {}
        self._owner: dict[int, int] = {}
        self._pending: list[int] = []
        self._active: list[list[int]] = [[] for _ in range(self.num_shards)]
        self._next_rid = 0

        self._decode_step = jax.jit(
            make_sharded_step(mesh, cfg, is_prefill=False, max_seqlens_q=1)
        )
        self._decode_multi_step = (
            jax.jit(
                make_sharded_multi_step(
                    mesh, cfg, num_steps=multi_step,
                    return_logprobs=logprobs, temperature=temperature,
                )
            )
            if multi_step > 1
            else None
        )
        self._prefill_steps: dict[int, object] = {}

    # ------------------------------------------------------------- requests
    def add_request(self, prompt_ids, max_new: int = 16, stop=None) -> int:
        need = len(prompt_ids) + max_new + (self.multi_step - 1)
        cap = self.max_blocks_per_seq * self.block_size
        if need > cap:
            raise ValueError(
                f"request needs {need} KV slots but the per-seq page table "
                f"caps a sequence at {cap}"
            )
        rid = self._next_rid
        self._next_rid += 1
        self.requests[rid] = Request(
            rid,
            list(map(int, prompt_ids)),
            max_new=max_new,
            stop=(self.stop_tokens if stop is None
                  else frozenset(map(int, stop))),
        )
        self._pending.append(rid)
        return rid

    # ----------------------------------------------------------- data movement
    def _put_rows(self, arr: np.ndarray):
        """Host array with leading dim num_shards*per_shard -> row-sharded."""
        return jax.device_put(
            jnp.asarray(arr), NamedSharding(self.mesh, self._rows_spec)
        )

    def _table(self, shard: int, rid: int) -> np.ndarray:
        return self.allocs[shard].table(rid, pad_to=self.max_blocks_per_seq)

    # ----------------------------------------------------------------- steps
    def _next_seed(self) -> int:
        # advance per sampling dispatch — a fixed seed would replay the
        # same Gumbel noise every step (see Engine._sample)
        self._sample_calls += 1
        return (self.seed + 0x9E3779B9 * self._sample_calls) % (2**31)

    def _sample_rows(self, logits) -> np.ndarray:
        """Greedy argmax, or per-row Gumbel temperature sampling."""
        if self.temperature <= 0.0:
            return np.asarray(jnp.argmax(logits, axis=-1)).reshape(-1)
        from hpc_ops_tpu.ops.sampler import fused_sampler_temperature_sample

        toks = fused_sampler_temperature_sample(
            jnp.asarray(logits, jnp.float32),
            self.temperature,
            seed=self._next_seed(),
        )
        return np.asarray(toks).reshape(-1)

    def _prefill_fn(self, bucket: int):
        if bucket not in self._prefill_steps:
            self._prefill_steps[bucket] = jax.jit(
                make_sharded_step(
                    self.mesh, self.cfg, is_prefill=True, max_seqlens_q=bucket
                )
            )
        return self._prefill_steps[bucket]

    def _prefill_round(self) -> None:
        """Prefill up to one pending request per shard in one global step
        (the next chunk of each when chunked prefill is on).

        All participating requests share one length bucket (the max chunk of
        the round); q_index/seq_lens are row-sharded, so per-shard offsets
        may differ. A request mid-prefill keeps its owner shard across
        rounds; it leaves ``_pending`` only once fully prefilled.
        """
        take: list[int | None] = [None] * self.num_shards
        # mid-prefill requests resume on their owner shard first
        for rid in self._pending:
            s = self._owner.get(rid)
            if s is not None and take[s] is None:
                take[s] = rid
        # fresh requests fill the remaining shards least-loaded first, so
        # single-request arrivals spread across shards instead of piling
        # onto shard 0
        fresh = (r for r in self._pending if self._owner.get(r) is None)
        free = sorted(
            (s for s in range(self.num_shards) if take[s] is None),
            key=lambda s: len(self._active[s]),
        )
        for s in free:
            take[s] = next(fresh, None)
        chunks: dict[int, int] = {}
        for rid in take:
            if rid is None:
                continue
            req = self.requests[rid]
            n = len(req.prompt) - req.prefilled
            if self.prefill_chunk is not None:
                n = min(self.prefill_chunk, n)
            chunks[rid] = n
        bucket = _bucket(max(chunks.values()))
        tokens = np.zeros((self.num_shards, bucket), np.int32)
        seq_lens = np.zeros((self.num_shards, 1), np.int32)
        q_index = np.zeros((self.num_shards, 2), np.int32)
        tables = np.zeros((self.num_shards, 1, self.max_blocks_per_seq), np.int32)
        for s, rid in enumerate(take):
            tables[s, 0, :] = self._dummy_blocks[s]
            if rid is None:
                seq_lens[s, 0] = 1  # dummy single-token row on this shard
                q_index[s] = (0, 1)
                continue
            req = self.requests[rid]
            start, n = req.prefilled, chunks[rid]
            self._owner[rid] = s
            self.allocs[s].extend(rid, start + n)  # extend() takes TOTAL tokens
            tokens[s, :n] = req.prompt[start : start + n]
            seq_lens[s, 0] = start + n
            q_index[s] = (0, n)
            tables[s, 0, :] = self._table(s, rid)
        logits, self.caches = self._prefill_fn(bucket)(
            self.weights,
            self.caches,
            self._put_rows(tokens.reshape(-1)),
            self._put_rows(seq_lens.reshape(-1)),
            self._put_rows(q_index.reshape(-1)),
            self._put_rows(tables.reshape(self.num_shards, -1)),
        )
        # prefill's last-row logits come back [num_shards, vocab]
        toks = self._sample_rows(logits)
        lps = None
        if self.logprobs:
            lsm = jax.nn.log_softmax(
                jnp.asarray(logits, jnp.float32), axis=-1
            )
            lps = np.asarray(
                jnp.take_along_axis(
                    lsm, jnp.asarray(toks.reshape(-1, 1)), axis=-1
                )
            ).reshape(-1)
        for s, rid in enumerate(take):
            if rid is None:
                continue
            req = self.requests[rid]
            req.prefilled += chunks[rid]
            if req.prefilled < len(req.prompt):
                continue  # more chunks to go; logits row is a partial prefix
            self._pending.remove(rid)
            req.out.append(int(toks[s]))
            if lps is not None:
                req.logprobs.append(float(lps[s]))
            self._active[s].append(rid)
            self._finish_if_done(req)

    def _finish_if_done(self, req: Request) -> None:
        if req.done:
            return  # idempotent: batch loops may re-check
        if len(req.out) >= req.max_new or (
            req.out and req.out[-1] in req.stop
        ):
            req.done = True
            s = self._owner.get(req.rid)
            if s is not None and req.rid in self._active[s]:
                self._active[s].remove(req.rid)
            if s is not None:
                self.allocs[s].free(req.rid)

    def _decode_round(self) -> None:
        b = self.max_batch
        tokens = np.zeros((self.num_shards, b), np.int32)
        seq_lens = np.ones((self.num_shards, b), np.int32)
        tables = np.zeros(
            (self.num_shards, b, self.max_blocks_per_seq), np.int32
        )
        served: list[list[int]] = []
        for s in range(self.num_shards):
            tables[s, :, :] = self._dummy_blocks[s]
            rids = self._active[s][:b]
            served.append(rids)
            for i, rid in enumerate(rids):
                req = self.requests[rid]
                new_len = len(req.tokens)
                self.allocs[s].extend(rid, new_len)
                tokens[s, i] = req.tokens[-1]
                seq_lens[s, i] = new_len
                tables[s, i] = self._table(s, rid)
        q_index = np.tile(np.arange(b + 1, dtype=np.int32), self.num_shards)
        logits, self.caches = self._decode_step(
            self.weights,
            self.caches,
            self._put_rows(tokens.reshape(-1)),
            self._put_rows(seq_lens.reshape(-1)),
            self._put_rows(q_index),
            self._put_rows(tables.reshape(self.num_shards * b, -1)),
        )
        toks = self._sample_rows(logits).reshape(self.num_shards, b)
        lps = None
        if self.logprobs:
            lsm = jax.nn.log_softmax(
                jnp.asarray(logits, jnp.float32), axis=-1
            )
            lps = np.asarray(
                jnp.take_along_axis(
                    lsm, jnp.asarray(toks.reshape(-1, 1)), axis=-1
                )
            ).reshape(self.num_shards, b)
        for s, rids in enumerate(served):
            for i, rid in enumerate(rids):
                req = self.requests[rid]
                req.out.append(int(toks[s, i]))
                if lps is not None:
                    req.logprobs.append(float(lps[s, i]))
                self._finish_if_done(req)

    def _decode_round_multi(self) -> None:
        """One fused multi_step decode dispatch over the whole mesh."""
        n = self.multi_step
        b = self.max_batch
        tokens = np.zeros((self.num_shards, b), np.int32)
        seq_lens = np.ones((self.num_shards, b), np.int32)
        tables = np.zeros(
            (self.num_shards, b, self.max_blocks_per_seq), np.int32
        )
        served: list[list[int]] = []
        for s in range(self.num_shards):
            tables[s, :, :] = self._dummy_blocks[s]
            rids = self._active[s][:b]
            served.append(rids)
            for i, rid in enumerate(rids):
                req = self.requests[rid]
                new_len = len(req.tokens)
                self.allocs[s].extend(rid, new_len + n - 1)
                tokens[s, i] = req.tokens[-1]
                seq_lens[s, i] = new_len
                tables[s, i] = self._table(s, rid)
        toks, self.caches = self._decode_multi_step(
            self.weights,
            self.caches,
            self._put_rows(tokens.reshape(-1)),
            self._put_rows(seq_lens.reshape(-1)),
            self._put_rows(tables.reshape(self.num_shards * b, -1)),
            jnp.int32(self._next_seed()),
        )
        if self.logprobs:
            toks, lps = toks
            lps = np.asarray(lps).reshape(n, self.num_shards, b)
        else:
            lps = None
        toks = np.asarray(toks).reshape(n, self.num_shards, b)
        for s, rids in enumerate(served):
            for i, rid in enumerate(rids):
                req = self.requests[rid]
                for j, t in enumerate(toks[:, s, i]):
                    if req.done or len(req.out) >= req.max_new:
                        break
                    req.out.append(int(t))
                    if lps is not None:
                        req.logprobs.append(float(lps[j, s, i]))
                    self._finish_if_done(req)
                self._finish_if_done(req)

    def step(self) -> bool:
        """One global step (a prefill round or a decode round). With chunked
        prefill on, decode rounds alternate with chunk rounds so active
        requests keep producing tokens while long prompts stream in."""
        if self._pending and not (
            self.prefill_chunk is not None
            and any(self._active)
            and self._prefer_decode
        ):
            self._prefill_round()
            self._prefer_decode = True
            return True
        self._prefer_decode = False
        if any(self._active):
            if self.multi_step > 1:
                self._decode_round_multi()
            else:
                self._decode_round()
            return True
        return False

    def run(self, prompts, max_new: int = 8) -> list:
        rids = [self.add_request(p, max_new=max_new) for p in prompts]
        while self.step():
            pass
        return [self.requests[r].out for r in rids]
