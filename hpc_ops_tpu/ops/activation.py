"""Fused activation + FP8 quantization family.

Reference parity (hpc/act.py, src/activation/activation.cu):
  - act_mul_and_quant:       y = silu(gate) * up * scale           -> fp8
  - masked_act_mul_and_quant: same, but rows beyond num_per_expert within each
    expert's padded slab are zeroed.
  - masked_act_mul_and_blockwise_quant: per-128-group scales
    (scale = max|y|/448, y = y / (scale+1e-8)), masked rows -> 0.
The ``use_bf16_mul`` flag matches the reference's bf16-multiply variant
(tests/test_act.py:20-27): silu computed in fp32, cast to bf16, multiplied with
bf16 up, then scaled in fp32.

Implementation: a Pallas row-tiled kernel on TPU (elementwise + per-group
reduce, HBM-bandwidth-bound) and an identical-math jnp path used as the
shape-inference/"fake" reference and the CPU/interpret fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpc_ops_tpu.config import BLOCKWISE_GROUP, FP8_DTYPE, FP8_MAX
from hpc_ops_tpu.utils.common import cdiv, fp8_saturate_cast, interpret_default


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _act_mul(gate_up: jax.Array, use_bf16_mul: bool) -> jax.Array:
    """silu(gate) * up in fp32, with optional bf16 rounding of the product."""
    c = gate_up.shape[-1] // 2
    gate = gate_up[..., :c].astype(jnp.float32)
    up = gate_up[..., c:]
    if use_bf16_mul:
        prod = _silu(gate).astype(jnp.bfloat16) * up.astype(jnp.bfloat16)
        return prod.astype(jnp.float32)
    return _silu(gate) * up.astype(jnp.float32)


# ---------------------------------------------------------------- references


def act_mul_and_quant_ref(gate_up, scale, use_bf16_mul=True):
    out = _act_mul(gate_up, use_bf16_mul) * scale.reshape(())[None, None].astype(
        jnp.float32
    )
    return fp8_saturate_cast(out)


def masked_act_mul_and_quant_ref(gate_up, scale, num_per_expert, use_bf16_mul=True):
    n, two_c = gate_up.shape
    e = num_per_expert.shape[0]
    rows_per_expert = n // e
    out = act_mul_and_quant_ref(gate_up, scale, use_bf16_mul)
    row = jnp.arange(n, dtype=jnp.int32)
    valid = (row % rows_per_expert) < num_per_expert[row // rows_per_expert]
    return jnp.where(valid[:, None], out, jnp.zeros_like(out))


def masked_act_mul_and_blockwise_quant_ref(gate_up, num_per_expert):
    n, two_c = gate_up.shape
    c = two_c // 2
    e = num_per_expert.shape[0]
    rows_per_expert = n // e
    out = _act_mul(gate_up, use_bf16_mul=False)
    g = BLOCKWISE_GROUP
    grp = out.reshape(n, c // g, g)
    scales = jnp.max(jnp.abs(grp), axis=-1) / FP8_MAX
    y = grp / (scales[..., None] + 1e-8)
    y = fp8_saturate_cast(y.reshape(n, c))
    row = jnp.arange(n, dtype=jnp.int32)
    valid = (row % rows_per_expert) < num_per_expert[row // rows_per_expert]
    y = jnp.where(valid[:, None], y, jnp.zeros_like(y))
    return y, scales


# ---------------------------------------------------------------- pallas path


def _act_quant_kernel(
    nv_ref, scale_ref, gate_ref, up_ref, out_ref, *, use_bf16_mul, tile_n
):
    i = pl.program_id(0)

    # tiles past the dynamic valid-row count hold only alignment padding
    # (MoE: dropped off-rank slots); skip their math and writes entirely
    @pl.when(i * tile_n < nv_ref[0])
    def _():
        gate = gate_ref[...].astype(jnp.float32)
        s = scale_ref[0]
        act = _silu(gate)
        if use_bf16_mul:
            prod = (
                act.astype(jnp.bfloat16) * up_ref[...].astype(jnp.bfloat16)
            ).astype(jnp.float32)
        else:
            prod = act * up_ref[...].astype(jnp.float32)
        if out_ref.dtype == jnp.int8:
            # int8 variant for the native s8 MXU path (see group_gemm)
            out_ref[...] = jnp.clip(
                jnp.round(prod * s), -127, 127
            ).astype(jnp.int8)
        else:
            out_ref[...] = jnp.clip(prod * s, -FP8_MAX, FP8_MAX).astype(
                FP8_DTYPE
            )


@functools.partial(
    jax.jit, static_argnames=("use_bf16_mul", "out_dtype", "interpret")
)
def _act_mul_and_quant_pallas(
    gate_up, scale, use_bf16_mul=True, out_dtype=FP8_DTYPE, interpret=False,
    num_valid=None,
):
    n, two_c = gate_up.shape
    c = two_c // 2
    tile_n = min(256, max(32, n))
    grid = (cdiv(n, tile_n),)
    if num_valid is None:
        num_valid = jnp.full((1,), n, jnp.int32)
    else:
        num_valid = num_valid.reshape(1).astype(jnp.int32)

    def pin(i, nv):
        return jnp.where(i * tile_n < nv[0], i, 0)

    # gate_up is passed twice: block-column 0 selects the gate half, 1 the up
    # half (block shape (tile_n, c) => column-block units of width c).
    return pl.pallas_call(
        functools.partial(
            _act_quant_kernel, use_bf16_mul=use_bf16_mul, tile_n=tile_n
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (tile_n, c), lambda i, nv: (pin(i, nv), 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (tile_n, c), lambda i, nv: (pin(i, nv), 1),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (tile_n, c), lambda i, nv: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((n, c), out_dtype),
        interpret=interpret,
    )(
        num_valid,
        scale.reshape(1).astype(jnp.float32),
        gate_up,
        gate_up,
    )


# ---------------------------------------------------------------- public API


def act_mul_and_quant(
    gate_up, scale, use_bf16_mul=True, *, out_dtype=FP8_DTYPE, impl="auto",
    num_valid=None,
):
    """silu(gate) * up * scale -> fp8_e4m3 (or int8 with out_dtype=jnp.int8,
    the TPU-native quantized-GEMM input format).

    Args:
      gate_up: [N, 2*C] bfloat16 (gate = first half, up = second half).
      scale: [1] float32 multiplier applied before quantization.
      use_bf16_mul: round the silu(gate)*up product through bf16 (reference's
        default numerical behavior).

    Returns: [N, C] float8_e4m3fn (or int8).
    """
    if impl == "ref":
        if out_dtype == jnp.int8:
            prod = _act_mul(gate_up, use_bf16_mul) * scale.reshape(())[
                None, None
            ].astype(jnp.float32)
            return jnp.clip(jnp.round(prod), -127, 127).astype(jnp.int8)
        return act_mul_and_quant_ref(gate_up, scale, use_bf16_mul)
    return _act_mul_and_quant_pallas(
        gate_up, scale, use_bf16_mul, out_dtype=out_dtype,
        interpret=interpret_default(), num_valid=num_valid,
    )


def masked_act_mul_and_quant(gate_up, scale, num_per_expert, use_bf16_mul=True):
    """Per-expert-masked act_mul_and_quant.

    gate_up is [num_expert * rows_per_expert, 2*C]; rows at index >=
    num_per_expert[e] within expert e's slab produce 0.
    """
    return masked_act_mul_and_quant_ref(gate_up, scale, num_per_expert, use_bf16_mul)


def masked_act_mul_and_blockwise_quant(gate_up, num_per_expert):
    """Masked act-mul with per-128-group blockwise FP8 quantization.

    Returns (y_fp8 [N, C], scales [N, C//128] float32).
    """
    return masked_act_mul_and_blockwise_quant_ref(gate_up, num_per_expert)


__all__ = [
    "act_mul_and_quant",
    "masked_act_mul_and_quant",
    "masked_act_mul_and_blockwise_quant",
    "act_mul_and_quant_ref",
    "masked_act_mul_and_quant_ref",
    "masked_act_mul_and_blockwise_quant_ref",
]
