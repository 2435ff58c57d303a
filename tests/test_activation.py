"""Tests for activation+quant family (reference: tests/test_act.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpc_ops_tpu.ops.activation import (
    act_mul_and_quant,
    act_mul_and_quant_ref,
    masked_act_mul_and_blockwise_quant,
    masked_act_mul_and_quant,
)
from hpc_ops_tpu.utils.testing import assert_allclose


def _np_silu(x):
    return x / (1.0 + np.exp(-x))


def _np_act_mul_quant(gate_up, scale, use_bf16_mul=True):
    gu = np.asarray(gate_up, np.float32)
    c = gu.shape[1] // 2
    gate, up = gu[:, :c], gu[:, c:]
    act = _np_silu(gate)
    if use_bf16_mul:
        act = act.astype(jnp.bfloat16).astype(np.float32)
        prod = (act * up).astype(jnp.bfloat16).astype(np.float32)
    else:
        prod = act * up
    out = prod * float(scale)
    return np.clip(out, -448, 448).astype(jnp.float8_e4m3fn).astype(np.float32)


def _f8_ordinal(x) -> np.ndarray:
    """Map e4m3 values to signed integer ordinals (adjacent codes differ
    by 1), so quantizer outputs can be compared by code distance."""
    b = np.asarray(x, np.float32).astype(jnp.float8_e4m3fn).view(np.uint8)
    return np.where(b & 0x80, -(b & 0x7F).astype(np.int32), (b & 0x7F).astype(np.int32))


def _assert_f8_codes_close(got, want, name, max_steps=1, max_frac=0.05):
    d = np.abs(_f8_ordinal(got) - _f8_ordinal(want))
    assert d.max() <= max_steps, f"{name}: fp8 code diff up to {d.max()} steps"
    frac = float((d != 0).mean())
    assert frac <= max_frac, f"{name}: {frac:.1%} of codes differ"


@pytest.mark.parametrize("n", [1, 7, 128, 300])
@pytest.mark.parametrize("c", [256, 1536])
@pytest.mark.parametrize("use_bf16_mul", [True, False])
def test_act_mul_and_quant(n, c, use_bf16_mul):
    key = jax.random.PRNGKey(41)
    gate_up = jax.random.normal(key, (n, 2 * c), jnp.bfloat16)
    scale = jnp.array([1.7], jnp.float32)

    out = act_mul_and_quant(gate_up, scale, use_bf16_mul)
    ref = act_mul_and_quant_ref(gate_up, scale, use_bf16_mul)
    want = _np_act_mul_quant(gate_up, 1.7, use_bf16_mul)

    assert out.dtype == jnp.float8_e4m3fn
    # Compare in fp8 CODE space, allowing one-code steps: a 1-ulp
    # cross-impl difference in silu (XLA host vs numpy exp) can flip the
    # bf16-rounded product across an fp8 boundary, which a value-space
    # atol can't express without going slack everywhere.
    _assert_f8_codes_close(np.asarray(out), want, name="pallas")
    _assert_f8_codes_close(np.asarray(ref), np.asarray(out, np.float32),
                           name="ref_vs_pallas")


def test_masked_act_mul_and_quant():
    key = jax.random.PRNGKey(3)
    e, rows, c = 4, 16, 256
    gate_up = jax.random.normal(key, (e * rows, 2 * c), jnp.bfloat16)
    scale = jnp.array([1.1], jnp.float32)
    num_per_expert = jnp.array([3, 16, 0, 7], jnp.int32)

    out = np.asarray(
        masked_act_mul_and_quant(gate_up, scale, num_per_expert), np.float32
    )
    dense = _np_act_mul_quant(gate_up, 1.1)
    keep = np.zeros((e * rows,), bool)
    for i, npe in enumerate([3, 16, 0, 7]):
        keep[i * rows : i * rows + npe] = True
    dense[~keep] = 0.0
    assert_allclose(out, dense, atol=0.25, rtol=0.06)


def test_masked_act_mul_and_blockwise_quant():
    key = jax.random.PRNGKey(7)
    e, rows, c = 2, 8, 512
    gate_up = jax.random.normal(key, (e * rows, 2 * c), jnp.bfloat16) * 3.0
    num_per_expert = jnp.array([5, 8], jnp.int32)

    y, scales = masked_act_mul_and_blockwise_quant(gate_up, num_per_expert)
    assert y.shape == (e * rows, c)
    assert scales.shape == (e * rows, c // 128)

    # Dequantized product should approximate silu(gate)*up on valid rows.
    gu = np.asarray(gate_up, np.float32)
    gate, up = gu[:, :c], gu[:, c:]
    want = _np_silu(gate) * up
    got = np.asarray(y, np.float32).reshape(e * rows, c // 128, 128) * (
        np.asarray(scales, np.float32)[..., None] + 1e-8
    )
    got = got.reshape(e * rows, c)
    keep = np.zeros((e * rows,), bool)
    keep[0:5] = True
    keep[rows : rows + 8] = True
    assert_allclose(got[keep], want[keep], atol=0.2, rtol=0.05)
    assert np.all(np.asarray(y, np.float32)[~keep] == 0.0)
