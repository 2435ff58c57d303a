from hpc_ops_tpu.parallel.collective_kernels import (
    fuse_allreduce_rmsnorm_pallas,
)
from hpc_ops_tpu.parallel.collectives import (
    fuse_allreduce_rmsnorm,
    fuse_allreduce_rmsnorm_ref,
    fuse_allreduce_rmsnorm_sharded,
)
from hpc_ops_tpu.parallel.mesh import make_mesh, tp_sharding
from hpc_ops_tpu.parallel.ring_attention import ring_attention

__all__ = [
    "fuse_allreduce_rmsnorm",
    "fuse_allreduce_rmsnorm_pallas",
    "fuse_allreduce_rmsnorm_sharded",
    "fuse_allreduce_rmsnorm_ref",
    "make_mesh",
    "ring_attention",
    "tp_sharding",
]
