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


def e4m3_bits_to_f32_fast(x_i8: jax.Array) -> jax.Array:
    """7-op e4m3fn-bits -> f32 decode for hot kernels.

    Builds the f32 bit pattern directly: sign to bit 31, the 7 payload bits
    to bits 26..20 (exponent field becomes 0000eeee, mantissa mmm<<20),
    then multiplies by 2^120 to rebias (2^(e-127) * 2^120 = 2^(e-7)).
    Exact for every NORMAL e4m3 value including +-448 and +-0.
    Deliberate deviations (documented contract of the fast path):
      * e4m3 subnormals (|x| <= 0.01367) decode to 0 when the VPU flushes
        f32 subnormals — bounded absolute error 0.0137 x scale, far inside
        every quantized-op tolerance;
      * NaN bytes decode to +-480 (quantizers never emit NaN).
    Use :func:`e4m3_bits_to_bf16` where bit-exactness matters.
    """
    xi = x_i8.astype(jnp.int32)
    bits = ((xi & 0x80) << 24) | ((xi & 0x7F) << 20)
    v = jax.lax.bitcast_convert_type(bits, jnp.float32)
    return v * jnp.float32(2.0 ** 120)


def e4m3_bits_to_bf16(x_i8: jax.Array) -> jax.Array:
    """Decode float8_e4m3fn BITS stored in an int8 array to bfloat16.

    Why this exists: v5e has no native fp8 — float8 arrays expand to 32-bit
    words in VMEM and their HBM->VMEM DMAs run ~6-10x below byte rate
    (measured: fp8 decode-attention at 64 GB/s vs int8 at full rate). fp8
    payloads therefore travel as int8 (``jax.lax.bitcast_convert_type(x,
    jnp.int8)``, zero-copy) and are decoded to bf16 with integer ops at the
    compute site. The decode is exact for every e4m3fn value (normals,
    subnormals, ±0, NaN), so fp8 semantics — and accuracy deltas — are
    bit-identical to the reference's hardware fp8 (hpc/attention.py fp8
    cache contract).

    Works inside Pallas kernels and in plain jnp code.
    """
    xi = x_i8.astype(jnp.int32) & 0xFF
    s = (xi >> 7) & 1
    e = (xi >> 3) & 0xF
    m = xi & 7
    # normal: value = (-1)^s * 2^(e-7) * (1 + m/8)  ->  bf16 exp = e + 120
    bits = (s << 15) | ((e + 120) << 7) | (m << 4)
    val = jax.lax.bitcast_convert_type(
        bits.astype(jnp.uint16), jnp.bfloat16
    )
    # subnormal (e == 0): value = (-1)^s * m * 2^-9 (m <= 7 is exact in bf16)
    sub = (1.0 - 2.0 * s.astype(jnp.float32)) * m.astype(jnp.float32)
    sub = (sub * jnp.float32(2.0 ** -9)).astype(jnp.bfloat16)
    val = jnp.where(e == 0, sub, val)
    # e4m3fn NaN: e == 15, m == 7 (the format has no inf)
    return jnp.where((e == 15) & (m == 7), jnp.bfloat16(jnp.nan), val)
