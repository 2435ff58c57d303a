"""e4m3-bits-in-int8 decode: exact over all 256 byte values."""

import numpy as np

import jax
import jax.numpy as jnp

from hpc_ops_tpu.utils.common import e4m3_bits_to_bf16


def test_e4m3_bits_to_bf16_exhaustive():
    bits = np.arange(256, dtype=np.uint8)
    x8 = jnp.asarray(bits).view(jnp.float8_e4m3fn)  # ground truth decode
    want = np.asarray(x8.astype(jnp.float32))
    got = np.asarray(
        e4m3_bits_to_bf16(jnp.asarray(bits.astype(np.int8))).astype(jnp.float32)
    )
    nan_w = np.isnan(want)
    assert (np.isnan(got) == nan_w).all()
    # every e4m3 value is exactly representable in bf16 -> exact equality
    np.testing.assert_array_equal(got[~nan_w], want[~nan_w])


def test_e4m3_bits_to_f32_fast_normals_exact():
    """Fast kernel decode: exact on every normal e4m3 value (incl. +-0,
    +-448); subnormal/NaN deviations are the documented contract."""
    from hpc_ops_tpu.utils.common import e4m3_bits_to_f32_fast

    bits = np.arange(256, dtype=np.uint8)
    want = np.asarray(
        jnp.asarray(bits).view(jnp.float8_e4m3fn).astype(jnp.float32)
    )
    got = np.asarray(e4m3_bits_to_f32_fast(jnp.asarray(bits.astype(np.int8))))
    e = (bits >> 3) & 0xF
    m = bits & 7
    normal = (e != 0) & ~((e == 15) & (m == 7))
    np.testing.assert_array_equal(got[normal], want[normal])
    zero = (e == 0) & (m == 0)
    np.testing.assert_array_equal(got[zero], want[zero])
    # subnormals: either exact (no FTZ) or flushed to zero
    sub = (e == 0) & (m != 0)
    ok = (got[sub] == want[sub]) | (got[sub] == 0.0)
    assert ok.all()
