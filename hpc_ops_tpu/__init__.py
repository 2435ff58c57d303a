"""hpc_ops_tpu — TPU-native quantized-inference operator framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of Tencent's
HPC-Ops CUDA operator library (see SURVEY.md for the full blueprint): FP8/BF16
paged-KV attention (prefill, decode, block-sparse), fused FP8 MoE, grouped
GEMM, the BF16xFP32 route GEMM, fused RoPE/RMSNorm/activation/sampling, the
Stem sparse-mask generator, dynamic decode scheduling, and ICI-fused
collective+norm ops under TP/EP meshes.
"""

from hpc_ops_tpu.config import (
    FP8_DTYPE,
    FP8_MAX,
    QKNormPolicy,
    QuantPolicy,
    QuantType,
    SoftmaxPolicy,
)

__version__ = "0.1.0.dev0"


def built_json() -> str:
    """Build provenance (reference analog: src/C/built_json.cu)."""
    import json

    import jax

    return json.dumps(
        {
            "version": __version__,
            "jax": jax.__version__,
            "backend": jax.default_backend(),
        }
    )


__all__ = [
    "QuantType",
    "SoftmaxPolicy",
    "QKNormPolicy",
    "QuantPolicy",
    "FP8_MAX",
    "FP8_DTYPE",
    "built_json",
    "__version__",
]
