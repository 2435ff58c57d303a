"""Fused sampler benchmark.

Mirrors benchmark/sampler in the reference: vocab 120832, batch sweep
1..512, comparing the fused sampler (full feature path and temperature-only
fast path) against an unfused jnp pipeline (softmax -> top-k -> top-p ->
categorical), the analog of the reference's "PyTorch pipeline" baseline
(README 8.5x claim).

Usage: python benchmark/sampler/bench_sampler.py --csv sampler.csv
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from common import Reporter, peak_hbm_gbps, time_chain

VOCAB = 120832


def _chain(fn, logits, rest, *, inner, trials, hint_sec):
    """Chained differential timing: the sampled token feeds a zero-valued
    perturbation back into the logits so XLA cannot fold the repeats."""

    def body(carry):
        lg = carry
        tok = fn(lg, *rest)
        # FULL-reduction dependency: a single-element dep lets XLA
        # slice-simplify the unfused baseline to one batch row
        dep = (jnp.max(tok) > jnp.int32(2**30)).astype(lg.dtype)
        return lg + dep

    return time_chain(body, logits, inner=inner, trials=trials,
                      hint_sec=hint_sec)


def unfused_pipeline(logits, temperature, topk, topp, key):
    """Eager jnp sampling pipeline (baseline)."""
    x = logits.astype(jnp.float32) / temperature
    vals, idx = jax.lax.top_k(x, topk)
    p = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(p, axis=-1)
    keep = cum - p < topp
    vals = jnp.where(keep, vals, -jnp.inf)
    choice = jax.random.categorical(key, vals)
    return jnp.take_along_axis(idx, choice[:, None], axis=1)


def main():
    ap = argparse.ArgumentParser()
    # the reference's full grid (benchmark/sampler/README.md): 1..512
    ap.add_argument(
        "--batches", nargs="*", type=int,
        default=[1, 4, 16, 64, 128, 256, 512],
    )
    ap.add_argument("--inner", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--csv", default=None)
    ap.add_argument("--jsonl", default=None)
    args = ap.parse_args()

    from hpc_ops_tpu.config import SoftmaxPolicy
    from hpc_ops_tpu.ops.sampler import fused_sampler

    rep = Reporter(csv_path=args.csv, jsonl_path=args.jsonl)
    rng = np.random.default_rng(41)
    key = jax.random.PRNGKey(7)

    full = lambda lg, t, k, p: fused_sampler(  # noqa: E731
        lg, temperature=t, topk=k, topp=p,
        softmax_policy=SoftmaxPolicy.BEFORE_TOPK, seed=3,
    )[0]
    full_ap = lambda lg, t, k, p: fused_sampler(  # noqa: E731
        lg, temperature=t, topk=k, topp=p,
        softmax_policy=SoftmaxPolicy.BEFORE_TOPK, seed=3,
        topk_impl="approx",
    )[0]
    fast = lambda lg, t: fused_sampler(lg, temperature=t)[0]  # noqa: E731
    base = lambda lg, key: unfused_pipeline(  # noqa: E731
        lg, 0.7, 32, jnp.float32(0.9), key
    )

    for b in args.batches:
        logits = jax.random.normal(jax.random.PRNGKey(b), (b, VOCAB)) * 4
        temp = jnp.full((b,), 0.7, jnp.float32)
        tk = jnp.full((b,), 32, jnp.int32)
        tp = jnp.full((b,), 0.9, jnp.float32)

        # speed-of-light: one logits read (f32) at HBM peak
        hint = b * VOCAB * 4 / (peak_hbm_gbps() * 1e9)
        trials = max(args.iters // 2, 3)
        t_full = _chain(full, logits, (temp, tk, tp),
                        inner=args.inner, trials=trials, hint_sec=hint)
        t_full_ap = _chain(full_ap, logits, (temp, tk, tp),
                           inner=args.inner, trials=trials, hint_sec=hint)
        t_fast = _chain(fast, logits, (temp,),
                        inner=args.inner, trials=trials, hint_sec=hint)
        t_base = _chain(base, logits, (key,),
                        inner=args.inner, trials=trials, hint_sec=hint)
        rep.add(
            _time=t_full,
            bench="sampler", batch=b, vocab=VOCAB,
            full_us=round(t_full * 1e6, 1),
            full_approx_us=round(t_full_ap * 1e6, 1),
            fast_us=round(t_fast * 1e6, 1),
            unfused_us=round(t_base * 1e6, 1),
            full_gbps=round(b * VOCAB * 4 / t_full / 1e9, 1),
            speedup_full_vs_unfused=round(t_base / t_full, 2),
            speedup_full_approx_vs_unfused=round(t_base / t_full_ap, 2),
            speedup_fast_vs_unfused=round(t_base / t_fast, 2),
        )
    rep.flush()


if __name__ == "__main__":
    main()
