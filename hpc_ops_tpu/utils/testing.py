"""Test comparison helpers.

Reproduces the reference test methodology (reference tests/utils.py:4-189):
an ``allclose`` that, on failure, prints a top-k table of the worst absolute
and relative errors with their indices, making tolerance debugging fast.
"""

from __future__ import annotations

import numpy as np


def _topk_error_table(name, a, b, k=10):
    a64 = np.asarray(a, dtype=np.float64).reshape(-1)
    b64 = np.asarray(b, dtype=np.float64).reshape(-1)
    abs_err = np.abs(a64 - b64)
    denom = np.maximum(np.abs(b64), 1e-12)
    rel_err = abs_err / denom
    order = np.argsort(-abs_err)[:k]
    lines = [f"top-{k} {name} errors (flat_idx, got, want, abs_err, rel_err):"]
    for i in order:
        lines.append(
            f"  [{i:>10d}] got={a64[i]: .6e} want={b64[i]: .6e} "
            f"abs={abs_err[i]:.3e} rel={rel_err[i]:.3e}"
        )
    lines.append(
        f"summary: max_abs={abs_err.max():.3e} mean_abs={abs_err.mean():.3e} "
        f"max_rel={rel_err.max():.3e} mismatched="
        f"{int(np.sum(abs_err > 0))}/{a64.size}"
    )
    return "\n".join(lines)


def assert_allclose(
    got, want, atol=1e-5, rtol=1e-5, name="output", k=10, equal_nan=False
):
    """np.allclose with a top-k error table on failure.

    NaNs are a failure by default — matching NaNs would let a test pass
    vacuously when both implementations blow up the same way (e.g. fp8
    overflow in badly-scaled test data). Pass ``equal_nan=True`` only when
    NaN is part of the op's contract.
    """
    got_np = np.asarray(got, dtype=np.float64)
    want_np = np.asarray(want, dtype=np.float64)
    assert got_np.shape == want_np.shape, (
        f"{name}: shape mismatch {got_np.shape} vs {want_np.shape}"
    )
    if not equal_nan and not np.isfinite(got_np).all():
        raise AssertionError(
            f"{name}: got contains {int(np.sum(~np.isfinite(got_np)))} "
            f"non-finite values"
        )
    if not np.allclose(got_np, want_np, atol=atol, rtol=rtol, equal_nan=equal_nan):
        raise AssertionError(
            f"{name}: allclose failed (atol={atol}, rtol={rtol})\n"
            + _topk_error_table(name, got_np, want_np, k=k)
        )


def max_abs_err(got, want) -> float:
    return float(
        np.max(np.abs(np.asarray(got, np.float64) - np.asarray(want, np.float64)))
    )
