"""Tests for fused RMSNorm+scale (reference: tests/test_normalization.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpc_ops_tpu.ops.normalization import (
    fused_rmsnorm_with_scale,
    fused_rmsnorm_with_scale_ref,
)
from hpc_ops_tpu.utils.testing import assert_allclose


def np_rmsnorm(x, w, eps):
    xf = np.asarray(x, np.float32)
    rms = 1.0 / np.sqrt(np.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return xf * rms * np.asarray(w, np.float32)


@pytest.mark.parametrize("batch", [1, 5, 17, 64])
@pytest.mark.parametrize("hidden", [320, 4096, 5120])
@pytest.mark.parametrize("is_moe", [False, True])
def test_fused_rmsnorm_with_scale(batch, hidden, is_moe):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (batch, hidden), jnp.bfloat16)
    w = jax.random.uniform(k2, (hidden,), jnp.bfloat16)
    scale = jnp.array([2.5, 5.0], jnp.float32)[: 2 if is_moe else 1]
    eps = 1e-6

    out = fused_rmsnorm_with_scale(x, w, eps=eps, scale=scale, is_moe=is_moe)
    ref = fused_rmsnorm_with_scale_ref(x, w, eps=eps, scale=scale, is_moe=is_moe)
    want32 = np_rmsnorm(x, w, eps)

    if is_moe:
        o32, o0, o1 = out
        r32, r0, r1 = ref
        assert_allclose(np.asarray(o32), want32, atol=5e-2, rtol=1e-2, name="fp32")
        assert_allclose(
            np.asarray(o1, np.float32) * 5.0,
            want32,
            atol=0.30,
            rtol=0.05,
            name="fp8_scale1",
        )
        assert_allclose(
            np.asarray(o0, np.float32),
            np.asarray(r0, np.float32),
            atol=1e-6,
            name="pallas_vs_ref",
        )
    else:
        assert out.dtype == jnp.float8_e4m3fn
        assert_allclose(
            np.asarray(out, np.float32) * 2.5,
            want32,
            atol=0.30,
            rtol=0.05,
            name="fp8",
        )
        assert_allclose(
            np.asarray(out, np.float32),
            np.asarray(ref, np.float32),
            atol=1e-6,
            name="pallas_vs_ref",
        )
