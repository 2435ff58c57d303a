from hpc_ops_tpu.utils.common import (
    cdiv,
    fp8_saturate_cast,
    interpret_default,
    on_tpu,
    round_up,
    up,
)
from hpc_ops_tpu.utils.testing import assert_allclose, max_abs_err

__all__ = [
    "cdiv",
    "round_up",
    "on_tpu",
    "interpret_default",
    "fp8_saturate_cast",
    "up",
    "assert_allclose",
    "max_abs_err",
]
