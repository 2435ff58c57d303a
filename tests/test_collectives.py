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


def test_make_hybrid_mesh_cpu():
    """DCN x ICI mesh layout on host devices: tp contiguous within a slice."""
    import numpy as np

    from hpc_ops_tpu.parallel.mesh import make_hybrid_mesh

    cpus = jax.devices("cpu")
    if len(cpus) < 8:
        pytest.skip("needs 8 host devices")
    from jax.sharding import PartitionSpec as P

    mesh = make_hybrid_mesh(dcn_dp=2, tp=4, dp=1, devices=cpus)
    assert mesh.axis_names == ("ddp", "dp", "tp")
    assert mesh.devices.shape == (2, 1, 4)
    # a tp all-reduce groups devices within one "slice" row
    with mesh:
        x = jnp.arange(8.0)
        f = jax.shard_map(
            lambda v: jax.lax.psum(v, "tp"),
            mesh=mesh,
            in_specs=P(("ddp", "dp", "tp")),
            out_specs=P(("ddp", "dp", "tp")),
        )
        out = np.asarray(f(x))
    # slice 0 devices hold sum(0..3), slice 1 hold sum(4..7)
    assert out[:4].tolist() == [6.0] * 4
    assert out[4:].tolist() == [22.0] * 4
