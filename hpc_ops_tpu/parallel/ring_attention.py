"""Ring attention: sequence-parallel exact attention over the ICI ring.

The reference's long-context story is single-device (block-sparse prefill
+ dynamic decode scheduling, SURVEY.md §5); TPU pods make true sequence
parallelism natural — this op shards the SEQUENCE across mesh devices and
computes exact (optionally causal) attention by rotating KV blocks around
the ring with ``jax.lax.ppermute`` while accumulating an online softmax,
so no device ever materializes more than its local KV shard plus one
in-flight block. Communication rides the ICI ring: P-1 permutes of the
local KV block, fully overlappable with the per-step attention matmuls by
XLA's latency-hiding scheduler.

Semantics: equivalent to dense (flash) attention over the full sequence.
With ``causal=True``, query row g attends to kv rows <= g in GLOBAL
positions (shard-local blocks are offset by shard index x block length).

Layout: call under ``shard_map`` with q/k/v sharded along the sequence
axis: local shapes q [B, S_loc, Hq, D], k/v [B, S_loc, Hkv, D], GQA via
Hq = G x Hkv. Returns the local output shard [B, S_loc, Hq, D] (bf16 in,
f32 accumulate, input-dtype out).

This first implementation computes every (q-shard, kv-block) pair and
masks — on causal workloads that is 2x the minimal FLOPs; the standard
load-balancing refinement (zigzag/striped block assignment) halves it and
composes with this accumulator unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ring_attention"]

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def ring_attention(
    q: jax.Array,  # [B, S_loc, Hq, D] (local shard)
    k: jax.Array,  # [B, S_loc, Hkv, D]
    v: jax.Array,  # [B, S_loc, Hkv, Dv]
    axis_name: str,
    *,
    causal: bool = True,
    sm_scale: float | None = None,
) -> jax.Array:
    """Exact sequence-parallel attention (see module docstring)."""
    b, s_loc, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv
    scale = (1.0 / (d**0.5)) if sm_scale is None else sm_scale
    p = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)

    # fold GQA into the head dim: [B, Hkv, G, S_loc, D]
    qf = (
        q.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(b, hkv, group, s_loc, d)
        * scale
    )

    perm = [(i, (i + 1) % p) for i in range(p)]  # ring: shard i -> i+1

    def local_block(kv, src):
        """Attend qf against one kv block that ORIGINATED at shard `src`."""
        kb, vb = kv
        kf = kb.astype(jnp.float32).transpose(0, 2, 1, 3)  # [B, Hkv, S, D]
        vf = vb.astype(jnp.float32).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhgqd,bhkd->bhgqk", qf, kf)
        if causal:
            qpos = my * s_loc + jnp.arange(s_loc)
            kpos = src * s_loc + jnp.arange(s_loc)
            mask = kpos[None, :] <= qpos[:, None]  # [S_q, S_k]
            s = jnp.where(mask[None, None, None], s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)  # [B,Hkv,G,S,1]
        e = jnp.exp(s - m)
        if causal:
            # fully-masked rows: s == m == _NEG_INF makes exp(s-m) = 1;
            # zero masked entries so such blocks contribute l = o = 0
            e = jnp.where(mask[None, None, None], e, 0.0)
        l = jnp.sum(e, axis=-1, keepdims=True)
        o = jnp.einsum("bhgqk,bhkd->bhgqd", e, vf)
        return m, l, o

    def step(i, carry):
        kv, m_acc, l_acc, o_acc = carry
        src = (my - i) % p  # the block now held arrived from this shard
        m_blk, l_blk, o_blk = local_block(kv, src)
        m_new = jnp.maximum(m_acc, m_blk)
        a_old = jnp.exp(m_acc - m_new)
        a_blk = jnp.exp(m_blk - m_new)
        l_new = l_acc * a_old + l_blk * a_blk
        o_new = o_acc * a_old + o_blk * a_blk
        kv = jax.tree.map(
            lambda x: jax.lax.ppermute(x, axis_name, perm), kv
        )
        return kv, m_new, l_new, o_new

    # derive the accumulators from qf so they carry the same device-varying
    # (shard_map VMA) type as the loop outputs
    m0 = jnp.full_like(qf[..., :1], _NEG_INF)
    l0 = jnp.zeros_like(m0)
    o0 = m0 * 0.0 + jnp.zeros((v.shape[-1],), jnp.float32)
    _, _, l_fin, o_fin = jax.lax.fori_loop(
        0, p, step, ((k, v), m0, l0, o0)
    )
    out = o_fin / jnp.maximum(l_fin, 1e-38)
    return (
        out.reshape(b, hq, s_loc, v.shape[-1])
        .transpose(0, 2, 1, 3)
        .astype(q.dtype)
    )
