"""Serving-engine throughput benchmark (decode tokens/s).

The reference is an operator library and leaves serving to vLLM/SGLang;
this framework carries the loop itself (runtime.Engine), so the serving
metric that matters — decode tokens/second through the engine, dispatch
overhead included — is benchmarked here directly.

Measures steady-state decode throughput of a continuously-batched engine
at a fixed batch, sweeping the fused multi-step block size
(Engine(multi_step=N): N decode iterations per compiled dispatch,
in-graph sampling — amortizes the per-dispatch host round trip, which on
a tunneled attachment is ~30ms and on local hosts still 100s of us) and
the KV-cache scheme (bf16 vs the int8 fused-layout serving fast path).

Wall-clock timing is the honest metric here BY DESIGN: every engine step
reads sampled tokens back to the host (a true device sync), and dispatch
cost is part of serving throughput — it is exactly what multi_step
amortizes. This differs from the kernel benches, which must use chained
differential timing (benchmark/common.py) to remove dispatch.

Usage: python benchmark/serving/bench_serving.py [--config mid] \
         [--multi-steps 1 8 32] [--batch 8] [--jsonl out.jsonl]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    # a sitecustomize-registered remote-TPU plugin overrides jax_platforms
    # at config level; force CPU back so a dead tunnel can't hang the bench
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache",
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from common import Reporter


CONFIGS = {
    # name -> ModelConfig kwargs (dense; kv_heads=8 GQA4 like the kernels)
    "tiny": dict(
        hidden=256, layers=2, q_heads=8, kv_heads=2, vocab=512,
        intermediate=512,
    ),
    "mid": dict(
        hidden=2048, layers=8, q_heads=16, kv_heads=8, vocab=32768,
        intermediate=8192,
    ),
    "large": dict(
        hidden=4096, layers=8, q_heads=32, kv_heads=8, vocab=32768,
        intermediate=14336,
    ),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="mid", choices=list(CONFIGS))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--decode-tokens", type=int, default=128,
                    help="decode tokens per request in the timed run")
    ap.add_argument("--multi-steps", type=int, nargs="*", default=[1, 8, 32])
    ap.add_argument(
        "--schemes", nargs="*", default=["bf16", "int8"],
        choices=["bf16", "int8", "w8a8"],
        help="bf16 | int8 (int8 fused KV) | w8a8 (int8 KV + int8 dense "
        "projections — the fully-int8 serving stack)",
    )
    ap.add_argument("--block-size", type=int, default=16)
    ap.add_argument("--csv", default=None)
    ap.add_argument("--jsonl", default=None)
    args = ap.parse_args()

    from hpc_ops_tpu.models.llama import ModelConfig, init_weights, tiny_config
    from hpc_ops_tpu.runtime.engine import Engine

    base = tiny_config()._asdict()
    base.update(CONFIGS[args.config])
    rep = Reporter(csv_path=args.csv, jsonl_path=args.jsonl)
    rng = np.random.default_rng(41)

    for scheme in args.schemes:
        cfg = ModelConfig(
            **{
                **base,
                "int8_kv": scheme in ("int8", "w8a8"),
                "dense_int8": scheme == "w8a8",
            }
        )
        weights = init_weights(jax.random.PRNGKey(0), cfg)
        total = args.prompt_len + args.decode_tokens
        for ms in args.multi_steps:
            blocks_per_seq = -(-(total + ms) // args.block_size)
            eng_kw = dict(
                num_blocks=(args.batch + 1) * blocks_per_seq,
                block_size=args.block_size,
                max_batch=args.batch,
                max_blocks_per_seq=blocks_per_seq,
                multi_step=ms,
            )
            prompts = [
                rng.integers(0, cfg.vocab, args.prompt_len).tolist()
                for _ in range(args.batch)
            ]

            # warmup run: compiles prefill + decode graphs, fills caches
            eng = Engine(cfg, weights, **eng_kw)
            eng.run([list(p) for p in prompts], max_new=max(2 * ms, 4))

            # timed run: fresh engine (warm compile cache), time only the
            # decode phase — step() returns tokens to the host every
            # dispatch, so perf_counter brackets true served throughput
            eng = Engine(cfg, weights, **eng_kw)
            for p in prompts:
                eng.add_request(list(p), max_new=args.decode_tokens)
            while eng._pending:  # prefill outside the timed region
                eng.step()
            t0 = time.perf_counter()
            steps = 0
            while eng.step():
                steps += 1
            dt = time.perf_counter() - t0
            toks = args.batch * args.decode_tokens - args.batch  # 1st tok in prefill
            rep.add(**{
                    "bench": "serving_decode",
                    "config": args.config,
                    "scheme": scheme,
                    "batch": args.batch,
                    "multi_step": ms,
                    "decode_tokens": args.decode_tokens,
                    "dispatches": steps,
                    "wall_s": round(dt, 4),
                    "tok_per_s": round(toks / dt, 1),
                    "ms_per_tok_per_req": round(1e3 * dt / max(toks // args.batch, 1), 3),
            })
    rep.flush()


if __name__ == "__main__":
    main()
