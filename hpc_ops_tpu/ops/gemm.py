"""Route GEMM: FP32-accurate matmul via split BF16 weights (dual-dot).

Reference parity: hpc/gemm.py:16-61 (gemm_bf16xfp32). The FP32 weight is
split as ``w_high = bf16(w)``, ``w_low = bf16((w - w_high) / scale)`` with
scale = 2^-8; the kernel computes ``x @ (w_high + scale*w_low)^T`` with both
dots fused in one pass over x (one x-tile load feeds two MXU matmuls, one
output write — the reference's 3.22x-vs-cuBLAS trick maps 1:1 onto the MXU).

``use_splitk``/``split_flag`` are accepted for API parity and ignored: a TPU
core reduces its k-grid sequentially in VMEM scratch, so there is no
cross-CTA split to synchronize.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpc_ops_tpu.utils.common import cdiv, interpret_default, round_up


def gemm_bf16xfp32_ref(x, w_high, w_low, scale, use_fp32_output=False):
    xf = x.astype(jnp.float32)
    w = w_high.astype(jnp.float32) + w_low.astype(jnp.float32) * scale.reshape(()).astype(
        jnp.float32
    )
    out = xf @ w.T
    return out if use_fp32_output else out.astype(jnp.bfloat16)


def _route_gemm_kernel(scale_ref, x_ref, wh_ref, wl_ref, o_ref, acc_hi, acc_lo):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_hi[...] = jnp.zeros_like(acc_hi)
        acc_lo[...] = jnp.zeros_like(acc_lo)

    x = x_ref[...]
    dims = (((1,), (1,)), ((), ()))
    acc_hi[...] += jax.lax.dot_general(
        x, wh_ref[...], dims, preferred_element_type=jnp.float32
    )
    acc_lo[...] += jax.lax.dot_general(
        x, wl_ref[...], dims, preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = (acc_hi[...] + scale_ref[0] * acc_lo[...]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("use_fp32_output", "tm", "tn", "tk", "interpret")
)
def _route_gemm_pallas(
    x, w_high, w_low, scale, use_fp32_output, tm, tn, tk, interpret=False
):
    m, k = x.shape
    n = w_high.shape[0]
    mp, np_, kp = round_up(m, tm), round_up(n, tn), round_up(k, tk)
    if (mp, kp) != (m, k):
        x = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    if (np_, kp) != (n, k):
        w_high = jnp.pad(w_high, ((0, np_ - n), (0, kp - k)))
        w_low = jnp.pad(w_low, ((0, np_ - n), (0, kp - k)))
    out_dtype = jnp.float32 if use_fp32_output else jnp.bfloat16
    out = pl.pallas_call(
        _route_gemm_kernel,
        grid=(mp // tm, np_ // tn, kp // tk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, tk), lambda i, j, l: (i, l), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tk), lambda i, j, l: (j, l), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tk), lambda i, j, l: (j, l), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j, l: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tm, tn), jnp.float32),
            pltpu.VMEM((tm, tn), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * mp * np_ * kp,
            bytes_accessed=(mp * kp + 2 * np_ * kp) * 2 + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scale.reshape(1).astype(jnp.float32), x, w_high, w_low)
    return out[:m, :n]


def gemm_bf16xfp32(
    x,
    w_high,
    w_low,
    scale,
    use_fp32_output: bool = False,
    use_splitk: bool = True,
    split_flag=None,
    *,
    tm: int = 256,
    tn: int = 256,
    tk: int = 512,
    impl: str = "auto",
):
    """FP32-accurate GEMM via two fused BF16 GEMMs.

    Args:
      x: [m, k] bfloat16 activations.
      w_high: [n, k] bfloat16 — high bits of the fp32 weight.
      w_low: [n, k] bfloat16 — residual, pre-divided by ``scale``.
      scale: scalar (typically 1/256).
      use_fp32_output: emit float32 instead of bfloat16.
      use_splitk / split_flag: accepted for reference API parity; no-ops.

    Returns: [m, n] bf16 or f32.
    """
    del use_splitk, split_flag
    if not isinstance(scale, jax.Array):
        scale = jnp.asarray([scale], jnp.float32)
    if impl == "ref":
        return gemm_bf16xfp32_ref(x, w_high, w_low, scale, use_fp32_output)
    m = x.shape[0]
    tm_eff = min(tm, max(8, round_up(m, 8)))
    return _route_gemm_pallas(
        x,
        w_high,
        w_low,
        scale,
        use_fp32_output,
        tm_eff,
        tn,
        tk,
        interpret=interpret_default(),
    )


def split_fp32_weight(w_fp32: jax.Array, scale: float = 1.0 / 256):
    """Produce (w_high, w_low, scale) from an fp32 weight (hpc/gemm.py:26-29)."""
    w_high = w_fp32.astype(jnp.bfloat16)
    w_low = ((w_fp32 - w_high.astype(jnp.float32)) / scale).astype(jnp.bfloat16)
    return w_high, w_low, jnp.asarray([scale], jnp.float32)


def get_gemm_bf16xfp32_workspace(max_weight_hidden_size: int, max_tokens: int = 131072):
    """Reference API parity (hpc/gemm.py:7-13); the TPU path needs no
    split-flag workspace — returns a zero array of the documented shape."""
    nm = cdiv(max_tokens, 16)
    nn = cdiv(max_weight_hidden_size, 64)
    return jnp.zeros((nm, nn), jnp.int32)


__all__ = [
    "gemm_bf16xfp32",
    "gemm_bf16xfp32_ref",
    "split_fp32_weight",
    "get_gemm_bf16xfp32_workspace",
]
