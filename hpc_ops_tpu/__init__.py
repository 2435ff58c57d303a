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


def _export_functions() -> list:
    """Auto-discover op modules and re-export their public callables.

    Reference analog: hpc/__init__.py:12-52 (_discover_modules /
    _export_functions) — ``import hpc_ops_tpu as hpc; hpc.attention_decode_bf16``
    works just like ``hpc.attention_decode_bf16`` in the reference. Modules
    that fail to import warn instead of crashing (reference behavior).
    """
    import importlib
    import warnings

    exported = []
    modules = [
        "hpc_ops_tpu.ops.activation",
        "hpc_ops_tpu.ops.attention",
        "hpc_ops_tpu.ops.gemm",
        "hpc_ops_tpu.ops.group_gemm",
        "hpc_ops_tpu.ops.kv_cache",
        "hpc_ops_tpu.ops.moe",
        "hpc_ops_tpu.ops.normalization",
        "hpc_ops_tpu.ops.quant",
        "hpc_ops_tpu.ops.rope",
        "hpc_ops_tpu.ops.sampler",
        "hpc_ops_tpu.ops.stem",
        "hpc_ops_tpu.parallel",
    ]
    g = globals()
    for modname in modules:
        try:
            mod = importlib.import_module(modname)
        except Exception as exc:  # pragma: no cover - import-env specific
            warnings.warn(f"hpc_ops_tpu: failed to import {modname}: {exc}")
            continue
        for name in getattr(mod, "__all__", []):
            if name.startswith("_"):
                continue
            if name in g:
                if g[name] is not getattr(mod, name):
                    warnings.warn(
                        f"hpc_ops_tpu: duplicate export {name!r} from {modname}"
                    )
                continue
            g[name] = getattr(mod, name)
            exported.append(name)
    return exported


__all__ = [
    "QuantType",
    "SoftmaxPolicy",
    "QKNormPolicy",
    "QuantPolicy",
    "FP8_MAX",
    "FP8_DTYPE",
    "built_json",
    "__version__",
] + _export_functions()
