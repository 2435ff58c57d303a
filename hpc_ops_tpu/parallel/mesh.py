"""Device-mesh helpers for TP / EP / DP sharding.

The reference's distributed substrate is a single-node NVLink multicast
communicator (SURVEY.md §2.2); on TPU the substrate is the ICI-connected
device mesh with XLA collectives. These helpers build standard inference
meshes and named shardings.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    tp: int = 1,
    dp: int = 1,
    ep: int | None = None,
    devices=None,
    backend: str | None = None,
) -> Mesh:
    """Build a (dp, tp) mesh. EP reuses the tp axis by default (experts
    sharded where the MoE weights are), matching the reference's TP=8/EP=8
    deployment shapes (benchmark/fused_moe/README.md modes).

    Use ``backend="cpu"`` with XLA_FLAGS=--xla_force_host_platform_device_count=N
    for the multi-chip simulation used in tests.
    """
    del ep
    if devices is None:
        devices = jax.devices(backend) if backend else jax.devices()
    n = dp * tp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.array(devices[:n]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def tp_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def make_hybrid_mesh(
    dcn_dp: int,
    tp: int,
    dp: int = 1,
    devices=None,
) -> Mesh:
    """Multi-host mesh: a slow DCN axis ("ddp", data-parallel across hosts /
    pod slices) times fast ICI axes ("dp", "tp") within a slice.

    Collective-heavy shardings (TP, EP) stay on the "tp" axis so their
    all-reduces ride ICI; only gradient/data movement crosses DCN — the
    layout rule for multislice inference (the reference is single-node
    NVLink only; DCN scaling is TPU-native headroom).
    """
    from jax.experimental import mesh_utils

    if devices is None:
        devs = mesh_utils.create_hybrid_device_mesh(
            (dp, tp), (dcn_dp, 1), allow_split_physical_axes=True
        )
    else:
        import numpy as np

        devs = np.asarray(devices[: dcn_dp * dp * tp]).reshape(dcn_dp, dp, tp)
    return Mesh(devs.reshape(dcn_dp, dp, tp), axis_names=("ddp", "dp", "tp"))


__all__ = [
    "make_mesh",
    "make_hybrid_mesh",
    "tp_sharding",
    "Mesh",
    "NamedSharding",
    "P",
]
