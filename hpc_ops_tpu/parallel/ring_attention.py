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

Two schedules: ``"ring"`` computes every (q-shard, kv-block) pair and
masks (simple; 2x the minimal causal FLOPs), ``"zigzag"`` uses the
balanced block layout (:func:`zigzag_layout`: shard i owns global blocks
i and 2p-1-i) and per step computes only the causally-live block pairs —
near the causal-FLOP optimum with equal work on every shard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ring_attention", "zigzag_layout", "zigzag_unlayout"]


def zigzag_layout(x: jax.Array, p: int, axis: int = 1) -> jax.Array:
    """Reorder a GLOBAL sequence axis into zigzag sharding order.

    The sequence is split into ``2p`` blocks; shard i owns blocks
    ``(i, 2p-1-i)`` — pairing an early and a late block balances causal
    work across the ring (shard 0 would otherwise attend almost nothing,
    shard p-1 almost everything). Shard the RESULT over the mesh axis;
    invert outputs with :func:`zigzag_unlayout`."""
    s = x.shape[axis]
    assert s % (2 * p) == 0, f"seq {s} must divide into 2p={2 * p} blocks"
    order = [b for i in range(p) for b in (i, 2 * p - 1 - i)]
    blocks = jnp.split(x, 2 * p, axis=axis)
    return jnp.concatenate([blocks[b] for b in order], axis=axis)


def zigzag_unlayout(x: jax.Array, p: int, axis: int = 1) -> jax.Array:
    """Inverse of :func:`zigzag_layout`."""
    order = [b for i in range(p) for b in (i, 2 * p - 1 - i)]
    inv = [order.index(b) for b in range(2 * p)]
    blocks = jnp.split(x, 2 * p, axis=axis)
    return jnp.concatenate([blocks[b] for b in inv], axis=axis)

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def ring_attention(
    q: jax.Array,  # [B, S_loc, Hq, D] (local shard)
    k: jax.Array,  # [B, S_loc, Hkv, D]
    v: jax.Array,  # [B, S_loc, Hkv, Dv]
    axis_name: str,
    *,
    causal: bool = True,
    sm_scale: float | None = None,
    schedule: str = "ring",
) -> jax.Array:
    """Exact sequence-parallel attention (see module docstring).

    ``schedule="zigzag"`` (causal only) expects inputs pre-permuted with
    :func:`zigzag_layout`: each shard holds global blocks (i, 2p-1-i), so
    causal work balances across the ring and each step computes only the
    live block pairs (2 per step, 3 on the diagonal step — near the
    causal-FLOP optimum instead of the all-pairs 4)."""
    b, s_loc, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv
    scale = (1.0 / (d**0.5)) if sm_scale is None else sm_scale
    p = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    if schedule == "zigzag":
        assert causal, "zigzag scheduling is a causal-balancing layout"
        return _ring_zigzag(q, k, v, axis_name, scale, p, my)
    assert schedule == "ring", schedule

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

    def merge(acc, blk_c):
        m_acc, l_acc, o_acc = acc
        m_blk, l_blk, o_blk = blk_c
        m_new = jnp.maximum(m_acc, m_blk)
        a_old = jnp.exp(m_acc - m_new)
        a_blk = jnp.exp(m_blk - m_new)
        return (
            m_new,
            l_acc * a_old + l_blk * a_blk,
            o_acc * a_old + o_blk * a_blk,
        )

    def step(i, carry):
        # rotate FIRST (steps 1..p-1): exactly p-1 permutes total — a
        # trailing rotate after the last compute would move a full K+V
        # block around the ring just to be discarded
        kv, acc = carry
        kv = jax.tree.map(
            lambda x: jax.lax.ppermute(x, axis_name, perm), kv
        )
        src = (my - i) % p  # the block now held arrived from this shard
        return kv, merge(acc, local_block(kv, src))

    # derive the accumulators from qf so they carry the same device-varying
    # (shard_map VMA) type as the loop outputs
    m0 = jnp.full_like(qf[..., :1], _NEG_INF)
    l0 = jnp.zeros_like(m0)
    o0 = m0 * 0.0 + jnp.zeros((v.shape[-1],), jnp.float32)
    acc0 = merge((m0, l0, o0), local_block((k, v), my))  # step 0: local
    _, (_, l_fin, o_fin) = jax.lax.fori_loop(
        1, p, step, ((k, v), acc0)
    )
    out = o_fin / jnp.maximum(l_fin, 1e-38)
    return (
        out.reshape(b, hq, s_loc, v.shape[-1])
        .transpose(0, 2, 1, 3)
        .astype(q.dtype)
    )


def _ring_zigzag(q, k, v, axis_name, scale, p, my):
    """Causal ring attention over the zigzag block layout (see
    ring_attention docstring). Each shard's local sequence is
    [block my | block 2p-1-my]; per ring step a 3-way lax.switch computes
    only the block pairs the causal structure makes live."""
    b, s_loc, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv
    dv = v.shape[-1]
    blk = s_loc // 2

    qf = (
        q.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(b, hkv, group, s_loc, d)
        * scale
    )
    q_lo, q_hi = qf[..., :blk, :], qf[..., blk:, :]
    tri = (
        jnp.arange(blk)[None, :] <= jnp.arange(blk)[:, None]
    )  # [q, k] causal triangle (same-block diagonal)
    mix = jnp.concatenate(
        [jnp.ones((blk, blk), bool), tri], axis=1
    )  # q_hi vs [k_lo full | k_hi diag]

    def blk_attn(qh, kf, vf, mask):
        s = jnp.einsum("bhgqd,bhkd->bhgqk", qh, kf)
        if mask is not None:
            s = jnp.where(mask[None, None, None], s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        if mask is not None:
            e = jnp.where(mask[None, None, None], e, 0.0)
        l = jnp.sum(e, axis=-1, keepdims=True)
        o = jnp.einsum("bhgqk,bhkd->bhgqd", e, vf)
        return m, l, o

    def merge(acc, blk_c):
        m_a, l_a, o_a = acc
        m_b, l_b, o_b = blk_c
        m_n = jnp.maximum(m_a, m_b)
        a_a = jnp.exp(m_a - m_n)
        a_b = jnp.exp(m_b - m_n)
        return m_n, l_a * a_a + l_b * a_b, o_a * a_a + o_b * a_b

    perm = [(i, (i + 1) % p) for i in range(p)]

    def compute(kv, src, acc_lo, acc_hi):
        kb, vb = kv
        kf = kb.astype(jnp.float32).transpose(0, 2, 1, 3)  # [B,Hkv,S,D]
        vf = vb.astype(jnp.float32).transpose(0, 2, 1, 3)
        k_lo, v_lo = kf[..., :blk, :], vf[..., :blk, :]

        def b_lt(_):  # src < my: q_lo<-ll full, q_hi<-hl full
            return (
                blk_attn(q_lo, k_lo, v_lo, None),
                blk_attn(q_hi, k_lo, v_lo, None),
            )

        def b_eq(_):  # src == my: diagonals + q_hi over its earlier half
            return (
                blk_attn(q_lo, k_lo, v_lo, tri),
                blk_attn(q_hi, kf, vf, mix),
            )

        def b_gt(_):  # src > my: q_lo attends nothing, q_hi both blocks
            zero = (
                jnp.full_like(acc_lo[0], _NEG_INF),
                jnp.zeros_like(acc_lo[1]),
                jnp.zeros_like(acc_lo[2]),
            )
            return zero, blk_attn(q_hi, kf, vf, None)

        idx = jnp.clip(jnp.sign(src - my), -1, 1) + 1
        lo_c, hi_c = jax.lax.switch(idx, [b_lt, b_eq, b_gt], None)
        return merge(acc_lo, lo_c), merge(acc_hi, hi_c)

    def step(i, carry):
        # rotate first (steps 1..p-1) — p-1 permutes total, no discarded
        # trailing rotation
        kv, acc_lo, acc_hi = carry
        kv = jax.tree.map(lambda x: jax.lax.ppermute(x, axis_name, perm), kv)
        src = (my - i) % p
        acc_lo, acc_hi = compute(kv, src, acc_lo, acc_hi)
        return kv, acc_lo, acc_hi

    def init_acc():
        m0 = jnp.full_like(q_lo[..., :1], _NEG_INF)
        l0 = jnp.zeros_like(m0)
        o0 = m0 * 0.0 + jnp.zeros((dv,), jnp.float32)
        return m0, l0, o0

    acc_lo0, acc_hi0 = compute((k, v), my, init_acc(), init_acc())
    _, acc_lo, acc_hi = jax.lax.fori_loop(
        1, p, step, ((k, v), acc_lo0, acc_hi0)
    )
    outs = []
    for _, l_f, o_f in (acc_lo, acc_hi):
        outs.append(o_f / jnp.maximum(l_f, 1e-38))
    out = jnp.concatenate(outs, axis=-2)  # [B,Hkv,G,S_loc,Dv]
    return (
        out.reshape(b, hq, s_loc, dv).transpose(0, 2, 1, 3).astype(q.dtype)
    )
