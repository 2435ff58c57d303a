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


_INTERPRET_OVERRIDE: bool | None = None


def set_interpret_override(value: bool | None) -> None:
    """Force (True/False) or reset (None) Pallas interpret mode globally.

    Needed when the default backend is TPU but a computation targets a CPU
    device mesh (e.g. the multi-chip dry-run on a host-device mesh)."""
    global _INTERPRET_OVERRIDE
    _INTERPRET_OVERRIDE = value


def interpret_default() -> bool:
    """Pallas kernels run in interpreter mode on non-TPU backends (CI/CPU-mesh)."""
    if _INTERPRET_OVERRIDE is not None:
        return _INTERPRET_OVERRIDE
    import os

    if os.environ.get("HPC_FORCE_INTERPRET"):
        return True
    return not on_tpu()


def fp8_saturate_cast(x: jax.Array, upper_max: float = FP8_MAX) -> jax.Array:
    """Clamp to ±upper_max then cast to float8_e4m3 (matches CUDA saturating cvt)."""
    x = jnp.clip(x.astype(jnp.float32), -upper_max, upper_max)
    return x.astype(FP8_DTYPE)


def up(x: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Upcast (typically fp8/bf16 -> fp32) for compute."""
    return x.astype(dtype)
