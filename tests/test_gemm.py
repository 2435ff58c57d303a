"""Tests for the BF16xFP32 route GEMM (reference: tests/test_gemm_bf16xfp32.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hpc_ops_tpu.ops.gemm import gemm_bf16xfp32, split_fp32_weight
from hpc_ops_tpu.utils.testing import assert_allclose


@pytest.mark.parametrize("m", [2, 16, 100, 512])
@pytest.mark.parametrize("n,k", [(192, 512), (256, 1024)])
@pytest.mark.parametrize("use_fp32_output", [False, True])
def test_gemm_bf16xfp32(m, n, k, use_fp32_output):
    rng = np.random.RandomState(41)
    x = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    w = jnp.asarray(rng.randn(n, k), jnp.float32)
    w_high, w_low, scale = split_fp32_weight(w)

    out = gemm_bf16xfp32(x, w_high, w_low, scale, use_fp32_output)
    want = np.asarray(x, np.float32) @ np.asarray(w).T

    expect_dtype = jnp.float32 if use_fp32_output else jnp.bfloat16
    assert out.dtype == expect_dtype
    # split-weight GEMM should be far more accurate than plain bf16
    tol = 2e-2 if use_fp32_output else 0.25
    assert_allclose(np.asarray(out, np.float32), want, atol=tol * np.sqrt(k) / 16, rtol=2e-2)

    # verify it beats single bf16 GEMM accuracy
    bf16_only = np.asarray(x, np.float32) @ np.asarray(w_high, np.float32).T
    err_split = np.abs(np.asarray(out, np.float32) - want).mean()
    err_bf16 = np.abs(bf16_only - want).mean()
    assert err_split < err_bf16
