"""Fused MoE benchmark.

Mirrors the reference's fused-MoE bench (benchmark/fused_moe/README.md):
model shapes from qwen3-235b / hunyuan-large / deepseek-v3 class MoEs, run
single-chip with EP/TP factors folded into the local expert count and
intermediate size (the reference benchmarks one GPU of a TP8/EP8 node the
same way). Reports latency plus achieved weight-bandwidth (the decode-batch
regime is weight-bound) and achieved TFLOP/s.

Usage:
    python benchmark/fused_moe/bench_fused_moe.py --models qwen3_235b \
        --tokens 128 1024 --csv moe.csv
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

from common import Reporter, peak_bf16_tflops, peak_hbm_gbps, time_chain

# name -> (hidden, intermediate, num_experts, topk) full-model shapes
MODELS = {
    # name -> (hidden, intermediate, experts_total, topk) — the reference's
    # default model table (benchmark/fused_moe/README.md): qwen3-235b /
    # hunyuan-v3 / deepseek-v3
    "qwen3_235b": (4096, 1536, 128, 8),
    "hunyuan_v3": (4096, 1536, 192, 8),
    "hunyuan_large": (6400, 3072, 16, 1),
    "deepseek_v3": (7168, 2048, 256, 8),
    "mixtral_8x7b": (4096, 14336, 8, 2),
}


def _stage_rows(rep, args, model, s, h, i_local, e_local, e_total, topk,
                x, w_gu, w_dn, topk_ids, topk_scale, qdt):
    """Time each pertensor-scatter pipeline stage in isolation.

    The fused number alone can't say whether the pipeline is bound by the
    grouped GEMMs (weight streaming), the activation quant (VPU), or the
    routing/reduce glue — these rows attribute the wall time. Every
    stage's fixed inputs ride in the chain carry (closure constants would
    ship through the remote-compile tunnel).
    """
    from hpc_ops_tpu.ops.activation import act_mul_and_quant
    from hpc_ops_tpu.ops.group_gemm import _gg_scatter_pallas
    from hpc_ops_tpu.ops.moe import _pick_tm, _route_aligned
    from hpc_ops_tpu.ops.moe import reduce as moe_reduce
    from hpc_ops_tpu.utils.common import interpret_default

    interp = interpret_default()

    navg = max(s * topk // max(e_total, 1), 1)
    tm = _pick_tm(navg)
    gu_scale = jnp.full((e_local,), 1e-3, jnp.float32)
    dn_scale = jnp.full((e_local,), 1e-3, jnp.float32)
    am_scale = jnp.ones((1,), jnp.float32)
    trials = max(args.iters // 2, 3)

    # materialize the pipeline once for the per-stage inputs
    row_idx, topk_pos, seqlens, cu, tiles, cu_tiles, grp = _route_aligned(
        topk_ids, e_local, 0, tm
    )
    nvt = cu_tiles[-1]
    tn1, tn2 = min(512, w_gu.shape[1]), min(512, w_dn.shape[1])
    gate_up = _gg_scatter_pallas(
        x, w_gu, gu_scale, row_idx, grp, tm, tn1, num_valid_tiles=nvt, interpret=interp
    )
    down_in = act_mul_and_quant(
        gate_up, am_scale, True, out_dtype=qdt, num_valid=nvt * tm
    )
    ident = jnp.arange(row_idx.shape[0], dtype=jnp.int32)
    down = _gg_scatter_pallas(
        down_in, w_dn, dn_scale, ident, grp, tm, tn2, num_valid_tiles=nvt, interpret=interp
    )

    def perturb_i8(a, dep):
        if a.dtype == jnp.int8:
            return (a.astype(jnp.int32) + dep).astype(jnp.int8)
        if a.dtype == jnp.float8_e4m3fn:
            return jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(a, jnp.int8) + dep.astype(jnp.int8),
                a.dtype,
            )
        return (a.astype(jnp.float32) + dep).astype(a.dtype)

    def t_route(c):
        ti, = c
        r = _route_aligned(ti, e_local, 0, tm)
        dep = (jnp.max(r[0]) > 2 ** 30).astype(jnp.int32)
        return ((ti + dep) % e_total,)

    def t_gemm1(c):
        xc, w, ri, g_, nv = c
        o = _gg_scatter_pallas(xc, w, gu_scale, ri, g_, tm, tn1,
                               num_valid_tiles=nv, interpret=interp)
        dep = (jnp.max(o).astype(jnp.float32) > 1e30).astype(jnp.int32)
        return (perturb_i8(xc, dep), w, ri, g_, nv)

    def t_act(c):
        gu, nv = c
        o = act_mul_and_quant(gu, am_scale, True, out_dtype=qdt,
                              num_valid=nv * tm)
        dep = (jnp.max(o).astype(jnp.float32) > 1e30).astype(jnp.bfloat16)
        return (gu + dep, nv)

    def t_gemm2(c):
        di, w, g_, nv = c
        idn = jnp.arange(di.shape[0], dtype=jnp.int32)
        o = _gg_scatter_pallas(di, w, dn_scale, idn, g_, tm, tn2,
                               num_valid_tiles=nv, interpret=interp)
        dep = (jnp.max(o).astype(jnp.float32) > 1e30).astype(jnp.int32)
        return (perturb_i8(di, dep), w, g_, nv)

    def t_reduce(c):
        dn, tp_, ts_ = c
        o = moe_reduce(dn, tp_, ts_)
        dep = (jnp.max(o).astype(jnp.float32) > 1e30).astype(jnp.bfloat16)
        return (dn + dep.astype(dn.dtype), tp_, ts_)

    stages = {
        "route": (t_route, (topk_ids,)),
        "gemm1": (t_gemm1, (x, w_gu, row_idx, grp, nvt)),
        "act": (t_act, (gate_up, nvt)),
        "gemm2": (t_gemm2, (down_in, w_dn, grp, nvt)),
        "reduce": (t_reduce, (down, topk_pos, topk_scale)),
    }
    stage_bytes = {
        "gemm1": w_gu.size,
        "gemm2": w_dn.size,
    }
    for name, (body, init) in stages.items():
        try:
            sec = time_chain(
                body, init, inner=args.inner, trials=trials,
                hint_sec=(stage_bytes.get(name, 0)
                          / (peak_hbm_gbps() * 1e9)) or None,
            )
        except Exception as exc:  # pragma: no cover - shape/env specific
            rep.add(bench="fused_moe_stage", model=model, tokens=s,
                    stage=name, error=str(exc)[:120])
            continue
        row = dict(
            bench="fused_moe_stage", model=model, tokens=s, ep=args.ep,
            dtype=args.dtype, stage=name, latency_us=round(sec * 1e6, 1),
        )
        if name in stage_bytes:
            row["weight_gbps"] = round(stage_bytes[name] / sec / 1e9, 1)
        rep.add(**row)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="*", default=["qwen3_235b", "deepseek_v3"])
    ap.add_argument("--tokens", nargs="*", type=int, default=[64, 256, 1024, 4096])
    ap.add_argument("--ep", type=int, default=8, help="expert-parallel factor")
    ap.add_argument("--tp", type=int, default=1, help="tensor-parallel factor")
    ap.add_argument("--blockwise", action="store_true")
    ap.add_argument(
        "--stages", action="store_true",
        help="time each pertensor-scatter pipeline stage separately "
        "(route / gemm1 / act / gemm2 / reduce) to locate the bottleneck",
    )
    ap.add_argument("--dtype", default="fp8", choices=["fp8", "int8"])
    ap.add_argument(
        "--fuse-act", action="store_true", dest="fuse_act",
        help="int8 only: pre-interleave gate/up weights and fuse "
        "silu*up*quant into the gate-up GEMM epilogue (serving fast path)",
    )
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--csv", default=None)
    ap.add_argument("--jsonl", default=None)
    ap.add_argument(
        "--trace", default=None, metavar="DIR",
        help="also capture a jax.profiler trace of each timed config into "
        "DIR (XProf device-time attribution — the nsys analog of the "
        "reference's benchmark/fused_moe/worker.py methodology)",
    )
    args = ap.parse_args()

    from hpc_ops_tpu.ops.moe import fuse_moe_blockwise_fp8, fuse_moe_pertensor_fp8
    from hpc_ops_tpu.ops.quant import blockwise_fp8_quant

    rep = Reporter(csv_path=args.csv, jsonl_path=args.jsonl)
    rng = np.random.default_rng(41)
    fp8 = jnp.float8_e4m3fn

    for model in args.models:
        h, inter, e_total, topk = MODELS[model]
        e_local = max(e_total // args.ep, 1)
        i_local = max(inter // args.tp, 128)
        kw1, kw2 = jax.random.split(jax.random.PRNGKey(1))
        # generate on-device: host->device copies can be very slow
        qdt = jnp.int8 if args.dtype == "int8" else fp8
        if args.dtype == "int8":
            w_gu = jax.random.randint(kw1, (e_local, 2 * i_local, h), -127, 127, jnp.int8)
            w_dn = jax.random.randint(kw2, (e_local, h, i_local), -127, 127, jnp.int8)
        else:
            w_gu = (jax.random.normal(kw1, (e_local, 2 * i_local, h)) / 8).astype(fp8)
            w_dn = (jax.random.normal(kw2, (e_local, h, i_local)) / 8).astype(fp8)
        for s in args.tokens:
            if args.dtype == "int8":
                x = jax.random.randint(jax.random.PRNGKey(s), (s, h), -127, 127, jnp.int8)
            else:
                x = (jax.random.normal(jax.random.PRNGKey(s), (s, h)) / 8).astype(fp8)
            topk_ids = jnp.asarray(
                np.stack(
                    [rng.choice(e_total, topk, replace=False) for _ in range(s)]
                ).astype(np.int32)
            )
            topk_scale = jnp.asarray(
                rng.random((s, topk)).astype(np.float32) / topk
            )
            if args.stages:
                _stage_rows(
                    rep, args, model, s, h, i_local, e_local, e_total, topk,
                    x, w_gu, w_dn, topk_ids, topk_scale, qdt,
                )
                continue
            if args.blockwise:
                fuse_act = False
                xs = jnp.ones((s, h // 128), jnp.float32)
                wgu_s = jnp.ones(
                    (e_local, 2 * i_local // 128, -(-h // 128)), jnp.float32
                )
                wdn_s = jnp.ones(
                    (e_local, h // 128, -(-i_local // 128)), jnp.float32
                )
                if args.dtype == "int8":
                    from hpc_ops_tpu.ops.moe import fuse_moe_blockwise_int8

                    moe_bw = fuse_moe_blockwise_int8
                else:
                    moe_bw = fuse_moe_blockwise_fp8
                fn = lambda x, xs, w_gu, w_dn, ti, ts: moe_bw(  # noqa: E731
                    x, xs, w_gu, wgu_s, w_dn, wdn_s, ti, ts,
                    rank_ep=0, num_expert_total=e_total,
                )
                fargs = (x, xs, w_gu, w_dn, topk_ids, topk_scale)
            else:
                gu_scale = jnp.full((e_local,), 1e-3 if args.dtype == "int8" else 1.0, jnp.float32)
                dn_scale = jnp.ones((e_local,), jnp.float32)
                am_scale = jnp.ones((1,), jnp.float32)
                fuse_act = args.fuse_act and args.dtype == "int8"
                w_gu_run = w_gu
                if fuse_act:
                    from hpc_ops_tpu.ops.moe import interleave_gate_up

                    w_gu_run = jax.jit(interleave_gate_up)(w_gu)
                fn = lambda x, w_gu, w_dn, ti, ts: fuse_moe_pertensor_fp8(  # noqa: E731
                    x, w_gu, w_dn, gu_scale, dn_scale, am_scale,
                    ti, ts, rank_ep=0, num_expert_total=e_total,
                    gate_up_interleaved=fuse_act,
                )
                fargs = (x, w_gu_run, w_dn, topk_ids, topk_scale)
            # chained differential timing: perturb x with a data-dependent
            # zero so XLA cannot fold the repeats
            def body(carry, fn=fn):
                xc, rest = carry[0], carry[1:]
                out = fn(xc, *rest)
                # FULL-reduction dependency: an element-sliced dep lets XLA
                # slice-simplify jnp stages (gather/reduce) out of the loop
                dep = (jnp.max(out).astype(jnp.float32) > 1e30).astype(
                    jnp.int32
                )
                if xc.dtype in (jnp.float8_e4m3fn, jnp.int8):
                    xn = jax.lax.bitcast_convert_type(
                        jax.lax.bitcast_convert_type(xc, jnp.int8)
                        + dep.astype(jnp.int8),
                        xc.dtype,
                    ) if xc.dtype != jnp.int8 else (
                        xc.astype(jnp.int32) + dep
                    ).astype(jnp.int8)
                else:
                    xn = (xc.astype(jnp.float32) + dep).astype(xc.dtype)
                return (xn, *rest)

            # weight-streaming lower bound as the signal hint so the headline
            # rows get the same swallowed-signal protection as the stages
            sec = time_chain(
                body, fargs, inner=args.inner,
                trials=max(args.iters // 2, 3),
                hint_sec=(w_gu.size + w_dn.size) / (peak_hbm_gbps() * 1e9),
            )
            if args.trace:
                from common import trace_fn

                scheme_tag = (
                    f"{'blockwise_' if args.blockwise else ''}{args.dtype}"
                )
                trace_fn(
                    lambda c: body(c), (fargs,),
                    f"{args.trace}/{model}_s{s}_{scheme_tag}",
                )
            # expected local expert work: tokens landing on this rank's experts
            frac_local = e_local / e_total
            eff_tokens = s * topk * frac_local
            flops = eff_tokens * (2 * h * 2 * i_local + 2 * i_local * h)
            w_bytes = w_gu.size + w_dn.size  # fp8: 1 byte/elt
            rep.add(
                _time=sec,
                bench="fused_moe",
                model=model,
                tokens=s,
                ep=args.ep,
                tp=args.tp,
                experts_local=e_local,
                scheme=(
                    f"blockwise_{args.dtype}"
                    if args.blockwise
                    else f"pertensor_{args.dtype}"
                    + ("_fusedact" if fuse_act else "")
                ),
                latency_us=round(sec * 1e6, 1),
                tflops=round(flops / sec / 1e12, 2),
                weight_gbps=round(w_bytes / sec / 1e9, 1),
                frac_peak_bw=round(w_bytes / sec / 1e9 / peak_hbm_gbps(), 4),
                frac_peak_flops=round(
                    flops / sec / 1e12 / peak_bf16_tflops(), 4
                ),
            )
    rep.flush()


if __name__ == "__main__":
    main()
