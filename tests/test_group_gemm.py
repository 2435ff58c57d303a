"""Tests for grouped GEMM (reference: tests/test_group_gemm_pertensor.py,
test_group_gemm_blockwise.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hpc_ops_tpu.ops.group_gemm import (
    group_gemm_blockwise_fp8,
    group_gemm_blockwise_ref,
    group_gemm_pertensor_fp8,
    group_gemm_ref,
    reformat_x_scale,
)
from hpc_ops_tpu.utils.testing import assert_allclose


def make_groups(rng, seqlens, k, n, g):
    total = sum(seqlens)
    x = rng.randn(total, k).astype(np.float32)
    w = rng.randn(g, n, k).astype(np.float32)
    cu = np.concatenate([[0], np.cumsum(seqlens)]).astype(np.int32)
    return x, w, cu


@pytest.mark.parametrize("seqlens", [[5, 0, 33, 7], [128], [1, 1, 1, 1, 60]])
def test_group_gemm_pertensor_fp8(seqlens):
    rng = np.random.RandomState(41)
    g, n, k = len(seqlens), 256, 512
    x, w, cu = make_groups(rng, seqlens, k, n, g)

    xs = np.abs(x).max() / 448.0
    x8 = jnp.asarray(x / xs, jnp.float8_e4m3fn)
    ws = np.abs(w).max() / 448.0
    w8 = jnp.asarray(w / ws, jnp.float8_e4m3fn)
    y_scale = jnp.full((g,), xs * ws, jnp.float32)

    out = group_gemm_pertensor_fp8(
        x8, w8, jnp.asarray(seqlens, jnp.int32), jnp.asarray(cu), y_scale,
        num_seq_per_group_avg=32,
    )
    ref = group_gemm_ref(
        x8, w8, jnp.asarray(seqlens, jnp.int32), jnp.asarray(cu), y_scale
    )

    # dequantized fp8 ground truth
    xd = np.asarray(x8, np.float32) * 1.0
    wd = np.asarray(w8, np.float32)
    want = np.zeros((sum(seqlens), n), np.float32)
    for gi in range(g):
        s, l = cu[gi], seqlens[gi]
        want[s : s + l] = (xd[s : s + l] @ wd[gi].T) * (xs * ws)

    assert_allclose(np.asarray(out, np.float32), want, atol=0.35, rtol=2e-2, name="pallas")
    assert_allclose(
        np.asarray(ref, np.float32), want, atol=0.35, rtol=2e-2, name="jnp_ref"
    )


@pytest.mark.parametrize("seqlens", [[9, 40], [70]])
def test_group_gemm_blockwise_fp8(seqlens):
    rng = np.random.RandomState(7)
    g, n, k = len(seqlens), 256, 512
    kb = k // 128
    x, w, cu = make_groups(rng, seqlens, k, n, g)
    total = sum(seqlens)

    # blockwise-quantize x per (row, 128-group); w per (128x128 block)
    xg = x.reshape(total, kb, 128)
    sx = np.abs(xg).max(-1) / 448.0 + 1e-8  # [total, kb]
    x8 = jnp.asarray(xg / sx[..., None], jnp.float8_e4m3fn).reshape(total, k)

    wg = w.reshape(g, n // 128, 128, kb, 128)
    sw = np.abs(wg).max(axis=(2, 4)) / 448.0 + 1e-8  # [g, n//128, kb]
    w8 = jnp.asarray(
        (wg / sw[:, :, None, :, None]).reshape(g, n, k), jnp.float8_e4m3fn
    )
    kb_pad = ((kb + 3) // 4) * 4
    w_scale = np.zeros((g, n // 128, kb_pad), np.float32)
    w_scale[:, :, :kb] = sw

    seqlens_j = jnp.asarray(seqlens, jnp.int32)
    cu_j = jnp.asarray(cu)

    out_nat = group_gemm_blockwise_fp8(
        x8, w8, seqlens_j, cu_j,
        jnp.asarray(sx), jnp.asarray(w_scale),
        num_seq_per_group_avg=32, x_scale_layout="natural",
    )
    ref = group_gemm_blockwise_ref(
        x8, w8, seqlens_j, cu_j, jnp.asarray(sx), jnp.asarray(w_scale)
    )

    # ground truth from dequantized blocks
    xd = np.asarray(x8, np.float32).reshape(total, kb, 128) * sx[..., None]
    wd = (
        np.asarray(w8, np.float32).reshape(g, n // 128, 128, kb, 128)
        * sw[:, :, None, :, None]
    ).reshape(g, n, k)
    want = np.zeros((total, n), np.float32)
    for gi in range(g):
        s, l = cu[gi], seqlens[gi]
        want[s : s + l] = xd[s : s + l].reshape(l, k) @ wd[gi].T

    assert_allclose(np.asarray(ref, np.float32), want, atol=0.3, rtol=3e-2, name="jnp_ref")
    assert_allclose(np.asarray(out_nat, np.float32), want, atol=0.3, rtol=3e-2, name="pallas")

    # reference transposed layout path
    xs_t = reformat_x_scale(jnp.asarray(sx), seqlens_j, cu_j, 32)
    out_t = group_gemm_blockwise_fp8(
        x8, w8, seqlens_j, cu_j, xs_t, jnp.asarray(w_scale),
        num_seq_per_group_avg=32, x_scale_layout="transposed",
    )
    assert_allclose(
        np.asarray(out_t, np.float32),
        np.asarray(out_nat, np.float32),
        atol=1e-5,
        name="transposed_layout",
    )


@pytest.mark.parametrize("seqlens", [[9, 40], [70]])
def test_group_gemm_blockwise_int8(seqlens):
    """INT8 blockwise grouped GEMM (native s8 MXU per-group dots) vs the
    dequantized ground truth."""
    from hpc_ops_tpu.ops.group_gemm import group_gemm_blockwise_int8
    from hpc_ops_tpu.ops.quant import blockwise_int8_quant

    rng = np.random.RandomState(13)
    g, n, k = len(seqlens), 256, 512
    kb = k // 128
    x, w, cu = make_groups(rng, seqlens, k, n, g)
    total = sum(seqlens)

    x8, sx = blockwise_int8_quant(jnp.asarray(x))  # [total,k], [total,kb]
    # w per (128x128 block): quantize each n-block row-group over its k-group
    wg = w.reshape(g, n // 128, 128, kb, 128)
    sw = np.abs(wg).max(axis=(2, 4)) / 127.0 + 1e-8  # [g, n//128, kb]
    w8 = jnp.asarray(
        np.clip(np.round(wg / sw[:, :, None, :, None]), -127, 127).reshape(
            g, n, k
        ),
        jnp.int8,
    )
    kb_pad = ((kb + 3) // 4) * 4
    w_scale = np.zeros((g, n // 128, kb_pad), np.float32)
    w_scale[:, :, :kb] = sw

    xd = np.asarray(x8, np.float32).reshape(total, kb, 128) * np.asarray(
        sx, np.float32
    )[..., None]
    wd = (
        np.asarray(w8, np.float32).reshape(g, n // 128, 128, kb, 128)
        * sw[:, :, None, :, None]
    ).reshape(g, n, k)
    want = np.zeros((total, n), np.float32)
    for gi in range(g):
        s, l = cu[gi], seqlens[gi]
        want[s : s + l] = xd[s : s + l].reshape(l, k) @ wd[gi].T

    # default scheme ("prescale", the fast path): both blockwise scales are
    # folded into bf16 operands, so each operand carries a 2^-9 relative
    # rounding — the absolute error budget scales with the row dot norm
    # (~sqrt(K) * |x||w|), not with atol-near-zero exactness
    out = group_gemm_blockwise_int8(
        x8, w8, jnp.asarray(seqlens, jnp.int32), jnp.asarray(cu),
        sx, jnp.asarray(w_scale),
        num_seq_per_group_avg=32, x_scale_layout="natural",
    )
    assert_allclose(
        np.asarray(out, np.float32), want, atol=0.5, rtol=1e-2,
        name="int8_blockwise_prescale",
    )

    # scheme="int8" (exact promotion): int8 codes dot exactly in s32; the
    # error budget is only the bf16 output cast (2^-8 rel) plus f32
    # scale-accum rounding
    out_exact = group_gemm_blockwise_int8(
        x8, w8, jnp.asarray(seqlens, jnp.int32), jnp.asarray(cu),
        sx, jnp.asarray(w_scale),
        num_seq_per_group_avg=32, x_scale_layout="natural", scheme="int8",
    )
    assert_allclose(
        np.asarray(out_exact, np.float32), want, atol=0.05, rtol=1e-2,
        name="int8_blockwise_exact",
    )


def test_group_gemm_fp8_scatter():
    """Scatter variant: in-kernel row gather vs materialized-gather oracle."""
    from hpc_ops_tpu.ops.group_gemm import _pick_tm, group_gemm_fp8_scatter

    rng = np.random.RandomState(11)
    total_tokens, k_dim, n, g = 50, 256, 384, 3
    tm = _pick_tm(32)
    num_tiles = 4
    x = jnp.asarray(rng.randn(total_tokens, k_dim) / 8, jnp.float8_e4m3fn)
    w = jnp.asarray(rng.randn(g, n, k_dim) / 8, jnp.float8_e4m3fn)
    y_scale = jnp.asarray(rng.rand(g).astype(np.float32))

    grp = jnp.asarray(np.array([0, 1, 1, 2], np.int32))
    row_idx = np.full((num_tiles * tm,), -1, np.int32)
    # scatter some real tokens into slots (ragged fill per tile)
    fill = [5, tm, 7, 1]
    for t in range(num_tiles):
        row_idx[t * tm : t * tm + fill[t]] = rng.randint(
            0, total_tokens, fill[t]
        )
    row_idx_j = jnp.asarray(row_idx)

    out = group_gemm_fp8_scatter(x, w, y_scale, row_idx_j, grp)
    assert out.shape == (num_tiles * tm, n)

    xf = np.asarray(x, np.float32)
    wf = np.asarray(w, np.float32)
    for t in range(num_tiles):
        gi = int(grp[t])
        for r in range(fill[t]):
            slot = t * tm + r
            want = xf[row_idx[slot]] @ wf[gi].T * float(y_scale[gi])
            got = np.asarray(out[slot], np.float32)
            np.testing.assert_allclose(got, want, atol=0.15, rtol=0.08)


def test_group_gemm_int8_native():
    """INT8 grouped GEMM (native s8xs8->s32 MXU path) vs the fp32 oracle."""
    import numpy as np
    from hpc_ops_tpu.ops.group_gemm import (
        group_gemm_pertensor_int8,
        group_gemm_ref,
    )
    from hpc_ops_tpu.ops.quant import scaled_int8_quant

    rng = np.random.RandomState(11)
    g, n, k = 4, 256, 512
    seqlens = np.array([40, 0, 100, 17], np.int32)
    total = int(seqlens.sum())
    cu = np.concatenate([[0], np.cumsum(seqlens)]).astype(np.int32)
    x = jnp.asarray(rng.randn(total, k), jnp.float32)
    w = jnp.asarray(rng.randn(g, n, k), jnp.float32)
    x8, xs = scaled_int8_quant(x)
    w8s = [scaled_int8_quant(w[i]) for i in range(g)]
    w8 = jnp.stack([a for a, _ in w8s])
    ws = jnp.concatenate([b for _, b in w8s])
    y_scale = xs.reshape(()) * ws  # [G]

    out = group_gemm_pertensor_int8(
        x8, w8, jnp.asarray(seqlens), jnp.asarray(cu), y_scale
    )
    want = group_gemm_ref(
        x8, w8, seqlens, cu, np.asarray(y_scale)
    )
    assert_allclose(
        np.asarray(out, np.float32)[: int(cu[-1])],
        np.asarray(want, np.float32),
        atol=5e-2,
        rtol=5e-2,
        name="int8_gg",
    )
