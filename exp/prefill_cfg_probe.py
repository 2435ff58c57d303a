"""Config probe for dense prefill at b8_2k: tq / pcb sweep with chained
timing. Isolates per-program overhead from compute."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmark"))

import numpy as np
import jax
import jax.numpy as jnp

from common import peak_bf16_tflops, time_chain  # noqa: E402

BLOCK_SIZE = 64
HEAD_DIM = 128


def run(case, tq, pcb):
    from hpc_ops_tpu.ops.attention.prefill import (
        attention_with_kvcache_prefill_bf16,
    )

    lens = {"b8_2k": [2048] * 8, "b2_8k": [8192] * 2,
            "b1_32k": [32768], "b16_1k": [1024] * 16}[case]
    lens = np.asarray(lens, np.int64)
    b = len(lens)
    total_q = int(lens.sum())
    max_q = int(lens.max())
    hkv, g = 8, 4
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
    tbl = jnp.asarray(tbl)
    sl = jnp.asarray(lens, jnp.int32)

    def body(carry):
        qc, kcc, vcc = carry
        out = attention_with_kvcache_prefill_bf16(
            qc, kcc, vcc, cu, tbl, sl, max_q,
            tq=tq, pages_per_compute_block=pcb,
        )
        dep = (out[0, 0, 0].astype(jnp.float32) > 1e30).astype(qc.dtype)
        return (qc + dep, kcc, vcc)

    flops = sum(2 * 2 * int(l) * int(l) * hq * HEAD_DIM / 2 for l in lens)
    hint = flops / (peak_bf16_tflops() * 1e12)
    sec = time_chain(body, (q, kc, vc), inner=8, trials=4, hint_sec=hint)
    tf = flops / sec / 1e12
    print(f"{case} tq={tq} pcb={pcb}: {sec*1e6:.0f}us {tf:.1f} TF "
          f"({tf/peak_bf16_tflops()*100:.1f}%)"
          + (" SUSPECT" if getattr(sec, "suspect", False) else ""),
          flush=True)


if __name__ == "__main__":
    for spec in sys.argv[1:]:
        case, tq, pcb = spec.split(",")
        run(case, int(tq), int(pcb))
