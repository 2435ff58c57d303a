"""Tests for FP8 quantization primitives."""

import jax
import jax.numpy as jnp
import numpy as np

from hpc_ops_tpu.ops.quant import (
    blockwise_fp8_dequant,
    blockwise_fp8_quant,
    fp8_dequant,
    per_token_per_head_fp8_quant,
    scaled_fp8_quant,
)
from hpc_ops_tpu.utils.testing import assert_allclose


def test_scaled_fp8_quant_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 512), jnp.bfloat16) * 4
    y, scale = scaled_fp8_quant(x)
    assert y.dtype == jnp.float8_e4m3fn
    back = fp8_dequant(y, scale, jnp.float32)
    assert_allclose(np.asarray(back), np.asarray(x, np.float32), atol=0.15, rtol=0.08)


def test_scaled_fp8_quant_static_scale():
    x = jnp.full((8, 128), 10.0, jnp.bfloat16)
    y, scale = scaled_fp8_quant(x, jnp.array([2.0], jnp.float32))
    assert float(scale[0]) == 2.0
    assert np.allclose(np.asarray(y, np.float32), 5.0)


def test_blockwise_quant_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 1024), jnp.float32) * 7
    y, scales = blockwise_fp8_quant(x)
    assert scales.shape == (16, 8)
    back = blockwise_fp8_dequant(y, scales)
    assert_allclose(np.asarray(back), np.asarray(x), atol=0.6, rtol=0.08)


def test_per_token_per_head_quant():
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 6, 128), jnp.float32) * 3
    y, scale = per_token_per_head_fp8_quant(x)
    assert scale.shape == (4, 6)
    back = np.asarray(y, np.float32) * np.asarray(scale)[..., None]
    assert_allclose(back, np.asarray(x), atol=0.2, rtol=0.08)
    # max |quantized| should be close to FP8_MAX for each (token, head)
    assert np.abs(np.asarray(y, np.float32)).max() <= 448.0
