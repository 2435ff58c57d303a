from hpc_ops_tpu.ops.attention.decode import (
    attention_decode,
    attention_decode_bf16,
    attention_decode_fp8,
)
from hpc_ops_tpu.ops.attention.reference import (
    attention_decode_ref,
    attention_prefill_bf16_ref,
    attention_with_kvcache_prefill_ref,
    mha_varlen_prefill_ref,
)

__all__ = [
    "attention_decode",
    "attention_decode_bf16",
    "attention_decode_fp8",
    "attention_decode_ref",
    "attention_prefill_bf16_ref",
    "attention_with_kvcache_prefill_ref",
    "mha_varlen_prefill_ref",
]
