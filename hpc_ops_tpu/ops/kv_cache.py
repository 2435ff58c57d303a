"""Paged KV-cache layout and update helpers.

Layout parity with the reference (hpc/attention.py:93-105): caches are
``[num_blocks, block_size, num_head_kv, head_dim]`` ("NHD"). On TPU we keep a
single canonical layout — the reference's NHD/HND stride trick is a CUDA
TMA-layout concern; XLA chooses physical layouts itself.

All updates are functional: callers pass caches in and receive updated caches
back; under ``jax.jit`` with donated arguments XLA performs them in place.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hpc_ops_tpu.utils.common import cdiv


class PagedKVCache(NamedTuple):
    """A pair of paged caches plus static geometry."""

    k: jax.Array  # [num_blocks, block_size, H_kv, D_qk]
    v: jax.Array  # [num_blocks, block_size, H_kv, D_v]

    @property
    def num_blocks(self) -> int:
        return self.k.shape[0]

    @property
    def block_size(self) -> int:
        return self.k.shape[1]

    @property
    def num_kv_heads(self) -> int:
        return self.k.shape[2]


def alloc_paged_cache(
    num_blocks: int,
    block_size: int,
    num_kv_heads: int,
    qk_dim: int,
    v_dim: int | None = None,
    dtype=jnp.bfloat16,
) -> PagedKVCache:
    v_dim = qk_dim if v_dim is None else v_dim
    return PagedKVCache(
        k=jnp.zeros((num_blocks, block_size, num_kv_heads, qk_dim), dtype),
        v=jnp.zeros((num_blocks, block_size, num_kv_heads, v_dim), dtype),
    )


def flat_slot_ids(
    positions: jax.Array,  # [rows] int32 logical position within the sequence
    req_ids: jax.Array,  # [rows] int32 request index per row
    block_ids: jax.Array,  # [num_req, max_blocks] int32 page table
    block_size: int,
    valid: jax.Array | None = None,  # [rows] bool
) -> jax.Array:
    """Map (request, position) -> flat slot index ``block*block_size + offset``.

    Invalid rows map to an out-of-range sentinel so scatter ``mode='drop'``
    discards them.
    """
    blk = positions // block_size
    off = positions % block_size
    phys = block_ids[req_ids, blk]
    slots = phys * block_size + off
    num_slots = block_ids.shape[0] * block_ids.shape[1] * block_size
    oob = jnp.int32(2**31 - 1)
    bad = phys < 0
    if valid is not None:
        bad = bad | ~valid
    return jnp.where(bad, oob, slots)


def store_kv(
    cache: PagedKVCache,
    k_new: jax.Array,  # [rows, H_kv, D_qk]
    v_new: jax.Array,  # [rows, H_kv, D_v]
    slots: jax.Array,  # [rows] flat slot ids (from flat_slot_ids)
    layout: str = "NHD",
) -> PagedKVCache:
    """Scatter new K/V rows into the paged cache (dropped where slots are OOB).

    layout "NHD": caches are [nb, bs, H, D] (reference contract);
    layout "HND": caches are [H, nb, bs, D] (the fast-kernel page layout —
    models should keep caches HND natively to avoid per-step transposes).
    """
    if layout == "HND":
        h, nb, bs, dk = cache.k.shape
        dv = cache.v.shape[-1]
        k_flat = cache.k.reshape(h, nb * bs, dk)
        v_flat = cache.v.reshape(h, nb * bs, dv)
        k_flat = k_flat.at[:, slots].set(
            jnp.moveaxis(k_new.astype(cache.k.dtype), 1, 0), mode="drop"
        )
        v_flat = v_flat.at[:, slots].set(
            jnp.moveaxis(v_new.astype(cache.v.dtype), 1, 0), mode="drop"
        )
        return PagedKVCache(
            k=k_flat.reshape(cache.k.shape), v=v_flat.reshape(cache.v.shape)
        )
    nb, bs, h, dk = cache.k.shape
    dv = cache.v.shape[-1]
    k_flat = cache.k.reshape(nb * bs, h, dk)
    v_flat = cache.v.reshape(nb * bs, h, dv)
    k_flat = k_flat.at[slots].set(k_new.astype(cache.k.dtype), mode="drop")
    v_flat = v_flat.at[slots].set(v_new.astype(cache.v.dtype), mode="drop")
    return PagedKVCache(k=k_flat.reshape(cache.k.shape), v=v_flat.reshape(cache.v.shape))


def zero_block_tails(
    cache: PagedKVCache,
    seq_lens: jax.Array,  # [num_req] total tokens now in cache per request
    block_ids: jax.Array,  # [num_req, max_blocks]
    layout: str = "NHD",
) -> PagedKVCache:
    """Zero unused slots of each request's last block.

    Attention-kernel precondition inherited from the reference
    (hpc/attention.py:97 "Unused slots in each request's last cache block
    should be zero-padded").
    """
    num_req = seq_lens.shape[0]
    bs = cache.block_size if layout == "NHD" else cache.k.shape[2]
    last_pos = seq_lens - 1
    last_blk = jnp.maximum(last_pos, 0) // bs
    last_off = jnp.maximum(last_pos, 0) % bs
    phys = block_ids[jnp.arange(num_req), last_blk]  # [num_req]
    offs = jnp.arange(bs, dtype=jnp.int32)[None, :]  # [1, bs]
    tail = offs > last_off[:, None]  # [num_req, bs]
    ok = (seq_lens > 0)[:, None] & (phys >= 0)[:, None] & tail
    slots = jnp.where(
        ok, phys[:, None] * bs + offs, jnp.int32(2**31 - 1)
    ).reshape(-1)
    if layout == "HND":
        h, nb, _, dk = cache.k.shape
        dv = cache.v.shape[-1]
        zk = jnp.zeros((h, slots.shape[0], dk), cache.k.dtype)
        zv = jnp.zeros((h, slots.shape[0], dv), cache.v.dtype)
        k_flat = cache.k.reshape(h, nb * bs, dk).at[:, slots].set(zk, mode="drop")
        v_flat = cache.v.reshape(h, nb * bs, dv).at[:, slots].set(zv, mode="drop")
        return PagedKVCache(
            k=k_flat.reshape(cache.k.shape), v=v_flat.reshape(cache.v.shape)
        )
    nb, _, h, dk = cache.k.shape
    dv = cache.v.shape[-1]
    zk = jnp.zeros((slots.shape[0], h, dk), cache.k.dtype)
    zv = jnp.zeros((slots.shape[0], h, dv), cache.v.dtype)
    k_flat = cache.k.reshape(nb * bs, h, dk).at[slots].set(zk, mode="drop")
    v_flat = cache.v.reshape(nb * bs, h, dv).at[slots].set(zv, mode="drop")
    return PagedKVCache(k=k_flat.reshape(cache.k.shape), v=v_flat.reshape(cache.v.shape))


def gather_kv(
    cache: PagedKVCache,
    block_ids: jax.Array,  # [num_req, max_blocks]
    max_len: int,
) -> tuple[jax.Array, jax.Array]:
    """Gather per-request contiguous K/V [num_req, max_len, H, D] (reference path).

    Used by jnp reference implementations of attention; fast paths read pages
    directly inside Pallas kernels instead.
    """
    bs = cache.block_size
    num_req = block_ids.shape[0]
    nblk = cdiv(max_len, bs)
    ids = block_ids[:, :nblk]  # [num_req, nblk]
    safe = jnp.maximum(ids, 0)
    k = cache.k[safe]  # [num_req, nblk, bs, H, Dk]
    v = cache.v[safe]
    dead = (ids < 0)[:, :, None, None, None]
    k = jnp.where(dead, 0, k)
    v = jnp.where(dead, 0, v)
    k = k.reshape(num_req, nblk * bs, *cache.k.shape[2:])[:, :max_len]
    v = v.reshape(num_req, nblk * bs, *cache.v.shape[2:])[:, :max_len]
    return k, v


__all__ = [
    "PagedKVCache",
    "alloc_paged_cache",
    "flat_slot_ids",
    "store_kv",
    "zero_block_tails",
    "gather_kv",
]
