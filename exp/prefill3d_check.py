"""Correctness sweep of the 3D-native dense prefill kernel (interpret mode,
CPU): adversarial varlen geometries — straddlers, sub-tq tails, tiny last
requests, clamp-shifted windows — vs the jnp oracle."""
import os
os.environ["HPC_FORCE_INTERPRET"] = "1"
os.environ["JAX_PLATFORMS"] = "cpu"
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
import hpc_ops_tpu as hpc

PAGE = 64


def run_case(lens, kv_extra, hq=16, hkv=4, d=128, seed=0):
    b = len(lens)
    kv_lens = [l + e for l, e in zip(lens, kv_extra)]
    max_kv = max(kv_lens)
    nbper = -(-max_kv // PAGE)
    nb = b * nbper
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(seed), 3)
    total = sum(lens)
    q = jax.random.normal(kq, (total, hq, d), jnp.bfloat16)
    kc = jax.random.normal(kk, (nb, PAGE, hkv, d), jnp.bfloat16) / 8
    vc = jax.random.normal(kv, (nb, PAGE, hkv, d), jnp.bfloat16) / 8
    cu = jnp.array(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    bids = (
        jnp.arange(b, dtype=jnp.int32)[:, None] * nbper
        + jnp.arange(nbper, dtype=jnp.int32)[None]
    )
    sl = jnp.array(kv_lens, jnp.int32)
    ref = hpc.attention_with_kvcache_prefill_bf16(
        q, kc, vc, cu, bids, sl, max(lens), impl="ref"
    )
    ok = True
    aligned = all(int(c) % 8 == 0 for c in np.asarray(cu))
    for al in ([False, True] if aligned else [False]):
        out = hpc.attention_with_kvcache_prefill_bf16(
            q, kc, vc, cu, bids, sl, max(lens), aligned_seq_starts=al
        )
        err = np.abs(
            np.asarray(out, np.float32) - np.asarray(ref, np.float32)
        ).max()
        tag = "OK " if err < 0.02 else "FAIL"
        ok &= err < 0.02
        print(f"{tag} lens={lens} kv_extra={kv_extra} aligned={al} "
              f"err={err:.4f}", flush=True)
    return ok


cases = [
    # aligned uniform (the bench shape, scaled down)
    ([512, 512], [0, 0]),
    # straddler tails within requests
    ([300, 517], [0, 0]),
    # tiny last request (< tq): clamp-shifted window + sub-tq tail
    ([512, 90], [0, 0]),
    # tiny FIRST request
    ([90, 512], [0, 0]),
    # single tiny request (total_q < SQ handled by n_tq shrink)
    ([130], [0, 0][:1]),
    # chunked-prefill: kv prefix longer than q (kv_off > 0)
    ([256, 256], [192, 64]),
    # everything at once
    ([130, 513, 77], [0, 100, 31]),
]
results = [run_case(l, e) for l, e in cases]
ok = all(results)
print("ALL OK" if ok else "FAILURES", flush=True)
