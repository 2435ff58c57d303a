"""Pallas fused RoPE + QK-RMSNorm + paged KV-store (the serving fast path).

Reference parity: hpc/rope.py rope_norm_store_kv — the reference fuses
rotate + norm + quant + paged scatter into one CUDA kernel
(src/rope/rope.cu:97-99). The XLA formulation in ops/rope.py is correct but
lowers the paged store to a serialized scatter (~35% of HBM roofline at
decode batches). This kernel keeps the whole op on-chip:

  * qkv rows stream into VMEM as grid blocks;
  * rotate/norm run on the VPU in fp32;
  * each token's K row and V row leave VMEM as ONE async DMA each, placed
    directly at its (page, slot) address in the HBM cache — no scatter, no
    f32 HBM intermediates. K/V DMAs are issued before the (4x larger) Q-head
    compute so descriptor issue hides under VPU work.

Layouts: "rows" mode stores into the reference NHD layout
([num_blocks, bs, H, D] — a token's [H, D] row is one contiguous 2KB DMA);
"head_major" mode stores into HND / fused-K|V pages ([H, S, D] flat — a
token's slab is one strided DMA). Both cost 2 descriptors per token.

Contract (matches the reference, which sizes qkv to exactly total_tokens —
hpc/rope.py:7-98): EVERY row of qkv is a real token. The wrapper in
ops/rope.py only auto-selects this path when it can also tile the row count;
arbitrary padded/invalid rows stay on the XLA path. Per-row `pl.when`
predication is not an option on Mosaic (compile-time explosion — see
ops/attention/paging.py note).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpc_ops_tpu.config import QKNormPolicy

_NORM_EPS = 1e-6


def _rope_store_kernel(
    # scalar prefetch
    slot_k_ref,  # [rows] int32 flat K slot per token
    slot_v_ref,  # [rows] int32 flat V slot per token
    # inputs
    qkv_ref,  # [RT, hidden] VMEM block
    cs_ref,  # [RT, d] f32 VMEM block (gathered cos|sin rows)
    qw_ref,  # [1, d] f32
    kw_ref,  # [1, d] f32
    sc_ref,  # [1, 128] f32: [0,0]=1/k_scale, [0,1]=1/v_scale (int8 quant)
    *refs,  # cache input ref(s), q_out, cache output ref(s), scratch, sem
    RT: int,
    hq: int,
    hkv: int,
    d: int,
    dv: int,
    policy: QKNormPolicy,
    head_major: bool,
    fused: bool,
):
    n_cache = 1 if fused else 2
    q_out_ref = refs[n_cache]
    cache_out = refs[n_cache + 1 : 2 * n_cache + 1]
    k_scr, v_scr, sem = refs[2 * n_cache + 1 :]
    k_out_ref = cache_out[0]
    v_out_ref = cache_out[0] if fused else cache_out[1]

    i = pl.program_id(0)
    x = qkv_ref[...].astype(jnp.float32)
    qe = hq * d
    ke = qe + hkv * d
    k = x[:, qe:ke].reshape(RT, hkv, d)
    v = x[:, ke:].reshape(RT, hkv, dv)

    cs = cs_ref[...]
    h2 = d // 2
    # basic-slice + reshape only: combining None-axis insertion with a lane
    # slice (cs[:, None, :h2]) lowers to a Mosaic gather, which fails on TPU
    c = cs[:, :h2].reshape(RT, 1, h2)
    s = cs[:, h2:].reshape(RT, 1, h2)

    def rot(t):
        t1 = t[..., :h2]
        t2 = t[..., h2:]
        return jnp.concatenate([t1 * c - t2 * s, t2 * c + t1 * s], axis=-1)

    def norm(t, w_ref):
        w = w_ref[...].reshape(1, 1, d)
        var = jnp.mean(t * t, axis=-1, keepdims=True)
        return t * jax.lax.rsqrt(var + _NORM_EPS) * w

    if policy == QKNormPolicy.NORM_THEN_ROPE:
        k = norm(k, kw_ref)
    k = rot(k)
    if policy == QKNormPolicy.ROPE_THEN_NORM:
        k = norm(k, kw_ref)

    cache_dtype = k_scr.dtype
    vf = v.astype(jnp.float32)
    if cache_dtype == jnp.int8:
        # symmetric per-tensor int8: y = clip(round(x / s), ±127)
        k = jnp.clip(jnp.round(k * sc_ref[0, 0]), -127, 127)
        vf = jnp.clip(jnp.round(vf * sc_ref[0, 1]), -127, 127)
    # Scratch keeps the token index in the LEADING (untiled) memref dim and
    # a per-token view that is the FULL trailing (hkv, d) tile pair — the
    # same shape discipline as MultiPageCopy's buf_ref.at[slot, i]. Any
    # per-token view that slices a *tiled* dim to length 1 (token in the
    # sublane dim, or an interposed size-1 dim that Mosaic pads to the
    # sublane tile) is rejected by Mosaic ("slice shape along dimension i
    # must be aligned to tiling"). The HBM side of a DMA accepts arbitrary
    # strided views, including integer-squeezed dynamic indices
    # (.at[:, sk, :]), so both cache layouts scatter from the same scratch.
    k_scr[...] = k.astype(cache_dtype)
    v_scr[...] = vf.astype(cache_dtype)

    base = i * RT
    copies = []
    for r in range(RT):
        sk = slot_k_ref[base + r]
        sv = slot_v_ref[base + r]
        if head_major:
            # cache view [hkv, S, d]: one strided descriptor per token
            copies.append(
                pltpu.make_async_copy(k_scr.at[r], k_out_ref.at[:, sk, :], sem)
            )
            copies.append(
                pltpu.make_async_copy(v_scr.at[r], v_out_ref.at[:, sv, :], sem)
            )
        else:
            # cache view [S, hkv, d]: a token's row is one contiguous run
            copies.append(
                pltpu.make_async_copy(k_scr.at[r], k_out_ref.at[sk], sem)
            )
            copies.append(
                pltpu.make_async_copy(v_scr.at[r], v_out_ref.at[sv], sem)
            )
    for cp in copies:
        cp.start()

    # Q (4x the K/V work) computes while the K/V DMAs drain.
    q = x[:, :qe].reshape(RT, hq, d)
    if policy == QKNormPolicy.NORM_THEN_ROPE:
        q = norm(q, qw_ref)
    q = rot(q)
    if policy == QKNormPolicy.ROPE_THEN_NORM:
        q = norm(q, qw_ref)
    q_out_ref[...] = q.reshape(RT, qe).astype(jnp.bfloat16)

    for cp in copies:
        cp.wait()


def pick_row_tile(rows: int) -> int | None:
    """Largest supported tile dividing ``rows`` (None -> use the XLA path)."""
    for rt in (128, 64, 32, 16, 8):
        if rows % rt == 0:
            return rt
    return None


def rope_store_rows(
    qkv: jax.Array,  # [rows, hidden] bf16, every row a real token
    cs_rows: jax.Array,  # [rows, d] f32 gathered cos|sin
    q_norm_weight: jax.Array | None,
    k_norm_weight: jax.Array | None,
    slot_k: jax.Array,  # [rows] int32 flat slots (caller clamps in-range)
    slot_v: jax.Array,
    caches: tuple[jax.Array, ...],  # (kflat, vflat) or (kvflat,) fused
    *,
    hq: int,
    hkv: int,
    d: int,
    dv: int,
    qk_norm_policy: int,
    head_major: bool,
    k_scale_inv: jax.Array | None = None,  # [] f32, required for int8 caches
    v_scale_inv: jax.Array | None = None,
    interpret: bool = False,
):
    """Run the fused kernel. caches are flat views:

    rows mode:       kflat [S, hkv, d], vflat [S, hkv, dv]
    head_major mode: kflat [hkv, S, d], vflat [hkv, S, dv]
    fused (single cache): kvflat [hkv, S, d]; slot_k/slot_v both index it.

    Returns (q_out [rows, hq*d] bf16, *updated_caches).
    """
    rows = qkv.shape[0]
    rt = pick_row_tile(rows)
    assert rt is not None, "caller must check pick_row_tile first"
    fused = len(caches) == 1
    policy = QKNormPolicy(qk_norm_policy)
    ones = jnp.ones((1, d), jnp.float32)
    qw = ones if q_norm_weight is None else q_norm_weight.reshape(1, d).astype(jnp.float32)
    kw = ones if k_norm_weight is None else k_norm_weight.reshape(1, d).astype(jnp.float32)
    cache_dtype = caches[0].dtype
    if cache_dtype == jnp.int8:
        assert k_scale_inv is not None and v_scale_inv is not None
        sc = jnp.zeros((1, 128), jnp.float32)
        sc = sc.at[0, 0].set(k_scale_inv.reshape(()).astype(jnp.float32))
        sc = sc.at[0, 1].set(v_scale_inv.reshape(()).astype(jnp.float32))
    else:
        sc = jnp.zeros((1, 128), jnp.float32)

    scr = [
        pltpu.VMEM((rt, hkv, d), cache_dtype),
        pltpu.VMEM((rt, hkv, dv), cache_dtype),
    ]

    hidden = qkv.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(rows // rt,),
        in_specs=[
            pl.BlockSpec((rt, hidden), lambda i, *_: (i, 0)),
            pl.BlockSpec((rt, d), lambda i, *_: (i, 0)),
            pl.BlockSpec((1, d), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, d), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, 128), lambda i, *_: (0, 0)),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)] * len(caches),
        out_specs=[pl.BlockSpec((rt, hq * d), lambda i, *_: (i, 0))]
        + [pl.BlockSpec(memory_space=pl.ANY)] * len(caches),
        scratch_shapes=scr + [pltpu.SemaphoreType.DMA],
    )
    kernel = functools.partial(
        _rope_store_kernel,
        RT=rt,
        hq=hq,
        hkv=hkv,
        d=d,
        dv=dv,
        policy=policy,
        head_major=head_major,
        fused=fused,
    )
    # operand order: slot_k, slot_v, qkv, cs, qw, kw, sc, caches... -> cache
    # operand index base is 7 (aliasing indices count scalar-prefetch args).
    aliases = {7 + j: 1 + j for j in range(len(caches))}
    out_shapes = [jax.ShapeDtypeStruct((rows, hq * d), jnp.bfloat16)] + [
        jax.ShapeDtypeStruct(c.shape, c.dtype) for c in caches
    ]
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(slot_k, slot_v, qkv, cs_rows, qw, kw, sc, *caches)
    return outs[0], *outs[1:]


__all__ = ["rope_store_rows", "pick_row_tile"]
