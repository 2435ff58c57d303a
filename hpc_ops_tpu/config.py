"""Configuration enums and constants for hpc_ops_tpu.

These mirror the semantic knobs of the reference CUDA library (see
/root/reference/hpc/attention.py:8-12 QuantType, /root/reference/hpc/sampler.py:8-27
SoftmaxPolicy, /root/reference/hpc/rope.py qk_norm_policy) so that the operator
contracts stay identical, while the implementations are TPU-native.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class QuantType(enum.IntEnum):
    """FP8 attention quantization schemes.

    Semantics match the reference (hpc/attention.py:8-12):
      - QPERTOKEN_PERHEAD_KPERTOKEN_PERHEAD_VPERHEAD: Q and K are quantized
        per-token-per-head; V per-head.
      - QPERTOKEN_PERHEAD_KPERTENSOR_VPERTENSOR: Q per-token-per-head; K and V
        per-tensor (a single scalar scale each).
      - QPERTENSOR_KPERTENSOR_VPERTENSOR: everything per-tensor.
    """

    QPERTOKEN_PERHEAD_KPERTOKEN_PERHEAD_VPERHEAD = 0
    QPERTOKEN_PERHEAD_KPERTENSOR_VPERTENSOR = 1
    QPERTENSOR_KPERTENSOR_VPERTENSOR = 2
    QPERTOKEN_PERHEAD_KPERTOKEN_PERHEAD_VPERHEAD_QKHADAMARD = 3


class SoftmaxPolicy(enum.IntEnum):
    """Where (if anywhere) the fused sampler runs softmax.

    Mirrors hpc/sampler.py:8-27:
      - NONE: no softmax; topk / Gumbel-max operate on raw logits.
      - BEFORE_TOPK: softmax over the full vocab before topk ("joint topk-topp").
      - AFTER_TOPK: topk on logits, then softmax over the surviving top-K.
    """

    NONE = 0
    BEFORE_TOPK = 1
    AFTER_TOPK = 2


class QKNormPolicy(enum.IntEnum):
    """RMSNorm placement relative to RoPE (hpc/rope.py qk_norm_policy)."""

    NONE = 0
    ROPE_THEN_NORM = 1
    NORM_THEN_ROPE = 2


class QuantPolicy(enum.IntEnum):
    """Q quantization mode for rope_norm_store_kv_fp8 (hpc/rope.py quant_policy)."""

    DYNAMIC_Q_STATIC_KV = 1  # "dqskv": per-token-per-head Q scale computed in kernel
    STATIC_Q_STATIC_KV = 2  # "sqskv": caller-supplied static q_scale_inv


# FP8 E4M3 saturation bound (finfo(float8_e4m3fn).max == 448).
FP8_MAX = 448.0
FP8_DTYPE = jnp.float8_e4m3fn

# Default blockwise-quantization group width (reference uses 128 everywhere).
BLOCKWISE_GROUP = 128

# Minimum work tile of the dynamic decode scheduler in KV tokens
# (reference: kMinTileN=64 on sm90, hpc/attention.py:549).
DECODE_SCHED_TILE = 256
