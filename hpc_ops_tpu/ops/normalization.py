"""Fused RMSNorm + scale -> FP8.

Reference parity (hpc/normalization.py:6-41, tests/test_normalization.py:13-19):
  y_norm = x * rsqrt(mean(x^2) + eps) * weight        (fp32 math)
  out    = fp8(y_norm / scale[i])
is_moe=True returns (y_norm_fp32, fp8(y/scale[0]), fp8(y/scale[1])) for the
shared + routed MoE branches; otherwise just fp8(y/scale[0]).

Unlike the reference (hidden sizes 320/4096/5120 compiled in), this works for
any hidden size — the Pallas kernel row-tiles and reduces over the full lane
dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpc_ops_tpu.config import FP8_DTYPE, FP8_MAX
from hpc_ops_tpu.utils.common import cdiv, interpret_default

_F32_EPS = float(jnp.finfo(jnp.float32).eps)


def rmsnorm_ref(x, weight, eps=1e-6):
    """Plain RMSNorm in fp32: x * rsqrt(mean(x^2) + eps) * weight."""
    xf = x.astype(jnp.float32)
    rms = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    out = xf * rms
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    return out


def fused_rmsnorm_with_scale_ref(a, weight, eps=_F32_EPS, scale=None, is_moe=False):
    if scale is None:
        scale = jnp.ones((1,), jnp.float32)
    norm = rmsnorm_ref(a, weight, eps)
    sc = scale.astype(jnp.float32)
    y0 = jnp.clip(norm / sc[0], -FP8_MAX, FP8_MAX).astype(FP8_DTYPE)
    if is_moe:
        y1 = jnp.clip(norm / sc[1], -FP8_MAX, FP8_MAX).astype(FP8_DTYPE)
        return norm, y0, y1
    return y0


def _rmsnorm_kernel(scale_ref, x_ref, w_ref, o32_ref, o0_ref, o1_ref, *, eps, is_moe):
    xf = x_ref[...].astype(jnp.float32)
    rms = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    norm = xf * rms * w_ref[...].astype(jnp.float32)
    inv0 = 1.0 / scale_ref[0]
    o0_ref[...] = jnp.clip(norm * inv0, -FP8_MAX, FP8_MAX).astype(FP8_DTYPE)
    if is_moe:
        o32_ref[...] = norm
        inv1 = 1.0 / scale_ref[1]
        o1_ref[...] = jnp.clip(norm * inv1, -FP8_MAX, FP8_MAX).astype(FP8_DTYPE)


@functools.partial(jax.jit, static_argnames=("eps", "is_moe", "interpret"))
def _fused_rmsnorm_pallas(a, weight, scale, eps, is_moe, interpret=False):
    n, h = a.shape
    tile_n = min(256, max(8, n))
    grid = (cdiv(n, tile_n),)
    kernel = functools.partial(_rmsnorm_kernel, eps=eps, is_moe=is_moe)
    row_spec = pl.BlockSpec((tile_n, h), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((n, h), jnp.float32),
        jax.ShapeDtypeStruct((n, h), FP8_DTYPE),
        jax.ShapeDtypeStruct((n, h), FP8_DTYPE),
    )
    o32, o0, o1 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row_spec,
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(row_spec, row_spec, row_spec),
        out_shape=out_shapes,
        interpret=interpret,
    )(scale.astype(jnp.float32), a, weight.reshape(1, h))
    return o32, o0, o1


def fused_rmsnorm_with_scale(a, weight, eps=_F32_EPS, scale=None, is_moe=False, *, impl="auto"):
    """RMSNorm then divide by scale(s), emitting fp8_e4m3.

    Args:
      a: [batch, hidden] bfloat16 input.
      weight: [hidden] (or [1, hidden]) RMSNorm gain.
      eps: variance epsilon.
      scale: [1] (is_moe=False) or [2] (is_moe=True) float32 divisors.
      is_moe: when True returns (norm_fp32, fp8(norm/scale[0]), fp8(norm/scale[1])).

    Returns: fp8 array, or the 3-tuple when is_moe.
    """
    if scale is None:
        scale = jnp.ones((2 if is_moe else 1,), jnp.float32)
    weight = weight.reshape(-1)
    if impl == "ref":
        return fused_rmsnorm_with_scale_ref(a, weight, eps, scale, is_moe)
    if is_moe:
        scale2 = scale.astype(jnp.float32)
    else:
        # Pad to [2] so the kernel signature is uniform; second output unused.
        scale2 = jnp.concatenate(
            [scale.reshape(1).astype(jnp.float32), jnp.ones((1,), jnp.float32)]
        )
    o32, o0, o1 = _fused_rmsnorm_pallas(
        a, weight, scale2, float(eps), bool(is_moe), interpret=interpret_default()
    )
    return (o32, o0, o1) if is_moe else o0


__all__ = ["fused_rmsnorm_with_scale", "fused_rmsnorm_with_scale_ref", "rmsnorm_ref"]
