"""Shared helpers: shape math, backend detection, fp8 casting."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hpc_ops_tpu.config import FP8_DTYPE, FP8_MAX


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


@functools.cache
def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


@functools.cache
def interpret_default() -> bool:
    """Pallas kernels run in interpreter mode on non-TPU backends (CI/CPU-mesh)."""
    return not on_tpu()


def fp8_saturate_cast(x: jax.Array, upper_max: float = FP8_MAX) -> jax.Array:
    """Clamp to ±upper_max then cast to float8_e4m3 (matches CUDA saturating cvt)."""
    x = jnp.clip(x.astype(jnp.float32), -upper_max, upper_max)
    return x.astype(FP8_DTYPE)


def up(x: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Upcast (typically fp8/bf16 -> fp32) for compute."""
    return x.astype(dtype)
