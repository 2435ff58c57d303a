"""FP8 quantization primitives.

Reference parity: hpc/act.py:108-114 (scaled_fp8_quant),
tests/test_act.py:105-114 (blockwise quant semantics: per-128-group scale =
max|x|/448, y = x / (scale + 1e-8)).

TPU note: v5e/v5p MXUs have no native fp8 matmul; fp8 here is a *storage*
format (float8_e4m3fn arrays in HBM). Compute paths upcast to bf16/fp32,
which preserves the reference's quantization semantics and accuracy deltas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hpc_ops_tpu.config import BLOCKWISE_GROUP, FP8_DTYPE, FP8_MAX
from hpc_ops_tpu.utils.common import fp8_saturate_cast


def scaled_fp8_quant(x: jax.Array, scale: jax.Array | None = None):
    """Quantize to FP8 E4M3 with one per-tensor scale: y = x / scale.

    Args:
      x: any-shape bf16/fp32 array.
      scale: [1] float32 per-tensor scale. If None, computed dynamically as
        max(|x|)/FP8_MAX.

    Returns:
      (y_fp8, scale): quantized array (same shape, float8_e4m3fn) and the
      scale actually used ([1] float32).
    """
    xf = x.astype(jnp.float32)
    if scale is None:
        scale = (jnp.max(jnp.abs(xf)) / FP8_MAX).reshape(1)
    inv = 1.0 / scale.reshape(()).astype(jnp.float32)
    return fp8_saturate_cast(xf * inv), scale.reshape(1).astype(jnp.float32)


def scaled_int8_quant(x: jax.Array, scale: jax.Array | None = None):
    """Quantize to int8 with one per-tensor symmetric scale: y = round(x/s).

    TPU-native counterpart of :func:`scaled_fp8_quant` (beyond the
    reference, which targets fp8-native GPUs): v5e's MXU runs int8 x int8
    natively (~1.4x bf16 throughput) while fp8 must upconvert. Returns
    (y_int8, scale [1] f32) with scale = max|x|/127 when dynamic.
    """
    xf = x.astype(jnp.float32)
    if scale is None:
        scale = (jnp.max(jnp.abs(xf)) / 127.0 + 1e-30).reshape(1)
    inv = 1.0 / scale.reshape(()).astype(jnp.float32)
    y = jnp.clip(jnp.round(xf * inv), -127, 127).astype(jnp.int8)
    return y, scale.reshape(1).astype(jnp.float32)


def fp8_dequant(y: jax.Array, scale: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize: x = y * scale."""
    return (y.astype(jnp.float32) * scale.reshape(()).astype(jnp.float32)).astype(dtype)


def blockwise_fp8_quant(x: jax.Array, group: int = BLOCKWISE_GROUP):
    """Per-group (last-dim, width ``group``) FP8 quantization.

    scale = max(|x_group|) / FP8_MAX;  y = x / (scale + 1e-8).

    Args:
      x: [..., C] with C % group == 0.

    Returns:
      (y_fp8 [..., C], scales [..., C // group] float32)
    """
    *lead, c = x.shape
    assert c % group == 0, f"last dim {c} not a multiple of {group}"
    xf = x.astype(jnp.float32).reshape(*lead, c // group, group)
    scale = jnp.max(jnp.abs(xf), axis=-1) / FP8_MAX
    y = xf / (scale[..., None] + 1e-8)
    return fp8_saturate_cast(y.reshape(*lead, c)), scale


def blockwise_fp8_dequant(
    y: jax.Array, scales: jax.Array, group: int = BLOCKWISE_GROUP, dtype=jnp.float32
) -> jax.Array:
    """Inverse of blockwise_fp8_quant (without the 1e-8 guard)."""
    *lead, c = y.shape
    yf = y.astype(jnp.float32).reshape(*lead, c // group, group)
    return (yf * (scales[..., None] + 1e-8)).reshape(*lead, c).astype(dtype)


def blockwise_int8_quant(x: jax.Array, group: int = BLOCKWISE_GROUP):
    """Per-group (last-dim, width ``group``) symmetric INT8 quantization.

    TPU-native counterpart of :func:`blockwise_fp8_quant` (beyond the
    reference, whose blockwise scheme targets fp8-native GPUs): int8 codes
    feed the MXU's native s8 x s8 -> s32 path with no decode ladder.
    scale = max(|x_group|) / 127;  y = clip(round(x / scale), +-127).

    Returns (y_int8 [..., C], scales [..., C // group] float32).
    """
    *lead, c = x.shape
    assert c % group == 0, f"last dim {c} not a multiple of {group}"
    xf = x.astype(jnp.float32).reshape(*lead, c // group, group)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    y = jnp.clip(jnp.round(xf / (scale[..., None] + 1e-30)), -127, 127)
    return y.reshape(*lead, c).astype(jnp.int8), scale


def per_token_per_head_fp8_quant(x: jax.Array, upper_max: float = FP8_MAX):
    """Quantize [..., tokens, heads, dim] per (token, head): scale over last dim.

    Returns (y_fp8, scale[..., tokens, heads] float32) with y = x / scale.
    Used by the Q side of the FP8 attention paths (QuantType Q per-token-per-head).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax / upper_max, 1e-12)
    y = xf / scale[..., None]
    return fp8_saturate_cast(y, upper_max), scale


def quantize_kv_fused_int8(k_pages: jax.Array, v_pages: jax.Array,
                           kscale: jax.Array | None = None,
                           vscale: jax.Array | None = None):
    """Quantize an HND KV cache to the fused int8 serving layout.

    k_pages/v_pages: [Hkv, nb, bs, D] bf16. Returns
    (kv_fused_int8 [Hkv, nb, 2*bs, D], kscale [1] f32, vscale [1] f32) for
    :func:`hpc_ops_tpu.ops.attention.decode.attention_decode` with
    ``cache_layout="FUSED"``. int8 (not fp8) is the TPU-native 8-bit cache
    code: it stays byte-packed in VMEM and converts to bf16 on the VPU at
    full rate, so the halved DMA bytes turn into real decode speedup
    (the reference's fp8 cache, hpc/attention.py:408-462, relies on SM90's
    native fp8 — on v5e fp8 expands to 32-bit words in VMEM).
    """
    from hpc_ops_tpu.ops.attention.paging import pack_kv_fused

    k_i8, ks = scaled_int8_quant(k_pages, kscale)
    v_i8, vs = scaled_int8_quant(v_pages, vscale)
    return pack_kv_fused(k_i8, v_i8), ks, vs


__all__ = [
    "scaled_fp8_quant",
    "scaled_int8_quant",
    "quantize_kv_fused_int8",
    "fp8_dequant",
    "blockwise_fp8_quant",
    "blockwise_fp8_dequant",
    "blockwise_int8_quant",
    "per_token_per_head_fp8_quant",
    "FP8_DTYPE",
    "FP8_MAX",
]
