"""Multi-host continuous batching over a hybrid (DCN x ICI) mesh.

Runs on a virtual 2-host x 4-chip CPU mesh for demonstration
(XLA_FLAGS=--xla_force_host_platform_device_count=8); on a real pod
slice, build the mesh from `jax.devices()` after `jax.distributed`
initialization — the engine code is identical (BASELINE config 5:
request rows + KV page pools shard across hosts, TP stays on ICI).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/multihost_serving.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")

from hpc_ops_tpu.models.llama import init_weights, tiny_config
from hpc_ops_tpu.parallel.mesh import make_hybrid_mesh
from hpc_ops_tpu.runtime.sharded_engine import ShardedEngine
from hpc_ops_tpu.utils.common import set_interpret_override


def main():
    devices = jax.devices("cpu")[:8]
    cfg = tiny_config()
    with jax.default_device(devices[0]):
        weights = init_weights(jax.random.PRNGKey(0), cfg)
        set_interpret_override(True)  # Pallas interpreter on the CPU mesh
        try:
            mesh = make_hybrid_mesh(dcn_dp=2, tp=4, dp=1, devices=devices)
            eng = ShardedEngine(
                cfg, weights, mesh,
                num_blocks=64, block_size=16, max_batch=4,
                max_blocks_per_seq=4, multi_step=4,
            )
            outs = eng.run([[1, 2, 3], [7, 8], [11, 12, 13, 14], [21]],
                           max_new=6)
        finally:
            set_interpret_override(None)
    for i, out in enumerate(outs):
        print(f"request {i}: {out}")


if __name__ == "__main__":
    main()
