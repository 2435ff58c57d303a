"""Fused AllReduce+Residual+RMSNorm benchmark.

Mirrors benchmark/fuse_allreduce_rmsorm in the reference: hidden sizes
4096/5120/7168, token counts 8..32768, world size 8, comparing the fused
collective+norm against the unfused baseline (all-reduce, then separate
residual+norm) — the reference's "1.76x vs NCCL+unfused" scenario.

On a single-chip host this runs over a virtual device mesh
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8),
which measures collective *schedule* quality, not ICI bandwidth; on a pod
slice it measures the real thing. Latency is microseconds per call.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from common import Reporter, time_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", nargs="*", type=int, default=[4096, 5120, 7168])
    ap.add_argument("--tokens", nargs="*", type=int, default=[8, 128, 2048, 32768])
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--csv", default=None)
    ap.add_argument("--jsonl", default=None)
    args = ap.parse_args()

    from hpc_ops_tpu.parallel.collectives import (
        _norm,
        fuse_allreduce_rmsnorm,
    )
    from hpc_ops_tpu.parallel.mesh import make_mesh

    devices = jax.devices()
    if len(devices) < 2:  # single-chip host: use the virtual CPU mesh
        devices = jax.devices("cpu")
    ws = len(devices)
    mesh = make_mesh(tp=ws, devices=devices)
    rep = Reporter(csv_path=args.csv, jsonl_path=args.jsonl)

    for h in args.hidden:
        weight = jnp.ones((h,), jnp.bfloat16)
        for n in args.tokens:
            if n % ws:
                continue
            xp = jax.random.normal(
                jax.random.PRNGKey(0), (ws, n, h), jnp.bfloat16
            )
            res = jax.random.normal(jax.random.PRNGKey(1), (n, h), jnp.bfloat16)

            for mode in ("two_shot", "one_shot"):
                fused = shard_map(
                    lambda xp, res: fuse_allreduce_rmsnorm(
                        xp[0], res, weight, 1e-6, mode=mode
                    ),
                    mesh=mesh,
                    in_specs=(P("tp", None, None), P(None, None)),
                    out_specs=(P(None, None), P(None, None)),
                    check_vma=False,
                )
                sec = time_fn(
                    fused, (xp, res), warmup=args.warmup, iters=args.iters
                )
                rep.add(
                    bench="fuse_allreduce_rmsnorm", hidden=h, tokens=n,
                    world=ws, mode=mode, latency_us=round(sec * 1e6, 1),
                )

            # unfused baseline: psum all-reduce, then norm as a separate op
            def unfused_body(xp, res):
                s = jax.lax.psum(xp[0].astype(jnp.float32), "tp")
                out_res = s + res.astype(jnp.float32)
                return _norm(out_res, weight, 1e-6), out_res.astype(jnp.bfloat16)

            unfused = shard_map(
                unfused_body, mesh=mesh,
                in_specs=(P("tp", None, None), P(None, None)),
                out_specs=(P(None, None), P(None, None)),
                check_vma=False,
            )
            sec_u = time_fn(
                unfused, (xp, res), warmup=args.warmup, iters=args.iters
            )
            rep.add(
                bench="fuse_allreduce_rmsnorm", hidden=h, tokens=n,
                world=ws, mode="unfused_allreduce",
                latency_us=round(sec_u * 1e6, 1),
            )
    rep.flush()


if __name__ == "__main__":
    main()
