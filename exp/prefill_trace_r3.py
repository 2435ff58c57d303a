"""XProf trace of the dense prefill kernel at b8_2k / b1_32k — where does
the non-MXU time go? (VERDICT r2 next-step #1)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmark"))

import numpy as np
import jax
import jax.numpy as jnp

from common import trace_fn  # noqa: E402

BLOCK_SIZE = 64
HEAD_DIM = 128


def build(lens, hkv=8, g=4):
    from hpc_ops_tpu.ops.attention.prefill import (
        attention_with_kvcache_prefill_bf16,
    )

    lens = np.asarray(lens, np.int64)
    b = len(lens)
    total_q = int(lens.sum())
    max_q = int(lens.max())
    hq = hkv * g
    nb_per = -(-lens // BLOCK_SIZE)
    total_blocks = int(nb_per.sum())
    max_blocks = int(nb_per.max())
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(b), 3)
    q = jax.random.normal(kq, (total_q, hq, HEAD_DIM), jnp.bfloat16)
    kc = (jax.random.normal(kk, (total_blocks, BLOCK_SIZE, hkv, HEAD_DIM)) / 8).astype(jnp.bfloat16)
    vc = (jax.random.normal(kv, (total_blocks, BLOCK_SIZE, hkv, HEAD_DIM)) / 8).astype(jnp.bfloat16)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]).astype(np.int32))
    tbl = np.zeros((b, max_blocks), np.int32)
    start = 0
    for i, nbp in enumerate(nb_per):
        tbl[i, :nbp] = np.arange(start, start + nbp, dtype=np.int32)
        start += nbp
    fn = lambda q, kc, vc: attention_with_kvcache_prefill_bf16(  # noqa: E731
        q, kc, vc, cu, jnp.asarray(tbl), jnp.asarray(lens, jnp.int32), max_q
    )
    return fn, (q, kc, vc)


if __name__ == "__main__":
    case = sys.argv[1] if len(sys.argv) > 1 else "b8_2k"
    lens = {"b8_2k": [2048] * 8, "b1_32k": [32768], "b2_8k": [8192] * 2}[case]
    fn, args = build(lens)
    out = trace_fn(fn, args, f"/tmp/prefill_trace_{case}", iters=2)
    print("trace:", out)
