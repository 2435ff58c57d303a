from hpc_ops_tpu.ops import activation, normalization, quant

__all__ = ["activation", "normalization", "quant"]
