"""Multi-chip tests for fused AllReduce+Residual+RMSNorm on a CPU device mesh
(reference: tests/test_fuse_allreduce_rmsnorm_high_throughput.py — their
method is multiprocess CUDA; ours is an 8-device host mesh, which the CUDA
reference cannot do)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpc_ops_tpu.parallel import (
    fuse_allreduce_rmsnorm_ref,
    fuse_allreduce_rmsnorm_sharded,
    make_mesh,
)
from hpc_ops_tpu.utils.testing import assert_allclose


@pytest.mark.parametrize("mode", ["two_shot", "one_shot"])
@pytest.mark.parametrize("n,h", [(8, 256), (64, 1024)])
@pytest.mark.parametrize("ws", [4, 8])
def test_fuse_allreduce_rmsnorm(mode, n, h, ws):
    cpus = jax.devices("cpu")
    if len(cpus) < ws:
        pytest.skip("not enough host devices")
    mesh = make_mesh(tp=ws, devices=cpus)

    rng = np.random.RandomState(10001)
    x_parts = jnp.asarray(rng.randn(ws, n, h), jnp.bfloat16)
    residual = jnp.asarray(rng.randn(n, h), jnp.bfloat16)
    weight = jnp.asarray(rng.randn(h), jnp.bfloat16)
    eps = 1e-6

    out, out_res = fuse_allreduce_rmsnorm_sharded(
        mesh, x_parts, residual, weight, eps, mode=mode
    )
    want, want_res = fuse_allreduce_rmsnorm_ref(x_parts, residual, weight, eps)

    assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        atol=1e-1, rtol=1e-1, name="out",
    )
    assert_allclose(
        np.asarray(out_res, np.float32), np.asarray(want_res, np.float32),
        atol=1e-1, rtol=1e-1, name="residual",
    )
