"""Fused AllReduce + Residual-add + RMSNorm over the device mesh.

Reference parity: hpc/allreduce.py (fuse_allreduce_rmsnorm_high_throughput /
low_latency) and tests/test_fuse_allreduce_rmsnorm_high_throughput.py:15-28:

    out_residual = sum_ranks(x) + residual
    out          = bf16(rmsnorm_f32(out_residual)) * weight

TPU design: the reference's NVLink multimem ld_reduce/st (one kernel doing
reduce + norm + broadcast, SURVEY.md §3.3) maps onto ICI as the two-shot
schedule its own low-latency path uses (hpc/allreduce.py:117):
``psum_scatter`` (reduce-scatter over the token dim) → fused residual+norm on
the local 1/world slice → ``all_gather``. XLA lowers both collectives onto
ICI and fuses the elementwise epilogue; each token's norm is computed on
exactly one chip (the reference's rank-sliced semantics). The one-shot mode
(psum + replicated norm) wins at small token counts where latency, not
bandwidth, dominates — the same trade the reference's two kernel variants
make.

These are *collective* ops: call them inside ``shard_map`` (axis_name bound),
or use the ``*_sharded`` wrapper that sets the shard_map up for you.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from hpc_ops_tpu.ops.normalization import rmsnorm_ref


def _norm(x_f32, weight, eps):
    rms = jax.lax.rsqrt(jnp.mean(x_f32 * x_f32, axis=-1, keepdims=True) + eps)
    return (x_f32 * rms).astype(jnp.bfloat16) * weight.reshape(1, -1).astype(
        jnp.bfloat16
    )


def fuse_allreduce_rmsnorm(
    x: jax.Array,
    residual: jax.Array,
    weight: jax.Array,
    rms_norm_eps: float,
    axis_name: str = "tp",
    mode: str = "two_shot",
):
    """Collective fused allreduce+residual+rmsnorm (call under shard_map).

    Args:
      x: [N, H] this rank's partial activations (to be summed over axis_name).
      residual: [N, H] replicated residual.
      weight: [H] norm gain.
      mode: "two_shot" (reduce-scatter + gather; bandwidth-optimal, the
        high-throughput variant) or "one_shot" (single all-reduce +
        replicated norm; latency-optimal for small N).

    Returns (out [N, H] bf16, out_residual [N, H] bf16), both replicated.
    """
    n, h = x.shape
    if mode == "one_shot":
        s = jax.lax.psum(x.astype(jnp.float32), axis_name)
        out_res = s + residual.astype(jnp.float32)
        return _norm(out_res, weight, rms_norm_eps), out_res.astype(jnp.bfloat16)

    ws = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    # reduce-scatter over tokens: each rank owns N/ws summed rows
    s_slice = jax.lax.psum_scatter(
        x.astype(jnp.float32), axis_name, scatter_dimension=0, tiled=True
    )  # [N/ws, H]
    res_slice = jax.lax.dynamic_slice_in_dim(residual, idx * (n // ws), n // ws, 0)
    out_res_slice = s_slice + res_slice.astype(jnp.float32)
    y_slice = _norm(out_res_slice, weight, rms_norm_eps)
    # gather both outputs back to full rows
    y = jax.lax.all_gather(y_slice, axis_name, axis=0, tiled=True)
    out_res = jax.lax.all_gather(
        out_res_slice.astype(jnp.bfloat16), axis_name, axis=0, tiled=True
    )
    return y, out_res


def fuse_allreduce_rmsnorm_sharded(
    mesh,
    x_parts: jax.Array,  # [ws, N, H] per-rank partials (leading dim = ranks)
    residual: jax.Array,
    weight: jax.Array,
    rms_norm_eps: float = 1e-6,
    axis_name: str = "tp",
    mode: str = "two_shot",
):
    """Standalone driver: shards x_parts over ``axis_name`` and runs the
    fused collective; returns replicated (out, out_residual)."""

    fn = functools.partial(
        fuse_allreduce_rmsnorm,
        weight=weight,
        rms_norm_eps=rms_norm_eps,
        axis_name=axis_name,
        mode=mode,
    )

    def body(xp, res):
        return fn(xp[0], res)

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis_name, None, None), P(*([None] * residual.ndim))),
        out_specs=(P(*([None] * 2)), P(*([None] * 2))),
        check_vma=False,
    )(x_parts, residual)


def fuse_allreduce_rmsnorm_ref(x_parts, residual, weight, rms_norm_eps=1e-6):
    """Oracle: sum over leading rank dim, add residual, norm (fp32)."""
    s = jnp.sum(x_parts.astype(jnp.float32), axis=0)
    out_res = s + residual.astype(jnp.float32)
    out = _norm(out_res, weight, rms_norm_eps)
    return out, out_res.astype(jnp.bfloat16)


__all__ = [
    "fuse_allreduce_rmsnorm",
    "fuse_allreduce_rmsnorm_sharded",
    "fuse_allreduce_rmsnorm_ref",
]
