"""Probe 2: cost of the natural-layout I/O patterns per window:
A) one [SQ, HPP, D] DMA + per-head sublane extraction to lane-packed +
   repack to [SQ, HPP, D] + one 3D write   (current _prefill3d_kernel)
B) HPP single-head plane DMAs in, scale in place, HPP plane DMAs out
   (needs dim-1 single-index HBM DMA slices: legality tested here)
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo/benchmark")
from common import time_chain

TOTAL, H, D, SQ, HPP = 4096 + 64, 32, 128, 1024, 8
REPS = 16  # windows per kernel call


def kern_extract(off_ref, x_hbm, o_hbm, q_buf, qs_buf, o_stage,
                 sem_in, sem_out):
    i = pl.program_id(0)
    off = off_ref[0] + i
    h0 = pl.multiple_of(off_ref[1] * HPP, HPP)
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(off, SQ), pl.ds(h0, HPP)], q_buf, sem_in)
    cp.start(); cp.wait()
    for j in range(HPP):
        qs_buf[:, j * D:(j + 1) * D] = q_buf[:, j, :] * 2.0
    for j in range(HPP):
        o_stage[:, j, :] = qs_buf[:, j * D:(j + 1) * D]
    ocp = pltpu.make_async_copy(
        o_stage, o_hbm.at[pl.ds(off, SQ), pl.ds(h0, HPP)], sem_out)
    ocp.start(); ocp.wait()


def kern_planes(off_ref, x_hbm, o_hbm, q3_buf, qs_buf, sem_in, sem_out):
    i = pl.program_id(0)
    off = off_ref[0] + i
    h0 = pl.multiple_of(off_ref[1] * HPP, HPP)
    cps = [pltpu.make_async_copy(
        x_hbm.at[pl.ds(off, SQ), h0 + j], q3_buf.at[j], sem_in)
        for j in range(HPP)]
    for c in cps:
        c.start()
    for c in cps:
        c.wait()
    for j in range(HPP):
        q3_buf[j] = q3_buf[j] * 2.0
    ocps = [pltpu.make_async_copy(
        q3_buf.at[j], o_hbm.at[pl.ds(off, SQ), h0 + j], sem_out)
        for j in range(HPP)]
    for c in ocps:
        c.start()
    for c in ocps:
        c.wait()


def build(kern, scratch):
    @jax.jit
    def run(x, offs):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(REPS,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=scratch + [
                    pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
            ),
            out_shape=jax.ShapeDtypeStruct((TOTAL, H, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(offs, x)
    return run


x = (jnp.arange(TOTAL * H * D, dtype=jnp.float32).reshape(TOTAL, H, D)
     % 997).astype(jnp.bfloat16)
offs = jnp.array([13, 1], jnp.int32)

variants = [
    ("extract", kern_extract,
     [pltpu.VMEM((SQ, HPP, D), jnp.bfloat16),
      pltpu.VMEM((SQ, HPP * D), jnp.bfloat16),
      pltpu.VMEM((SQ, HPP, D), jnp.bfloat16)]),
    ("planes", kern_planes,
     [pltpu.VMEM((HPP, SQ, D), jnp.bfloat16),
      pltpu.VMEM((SQ, HPP * D), jnp.bfloat16)]),
]
for name, kern, scratch in variants:
    try:
        run = build(kern, scratch)
        out = np.asarray(run(x, offs), np.float32)
    except Exception as exc:
        print(f"{name}: FAILED {str(exc)[:140]}", flush=True)
        continue
    lo = 13 + REPS - 1
    want = np.asarray(x, np.float32)[lo:lo + SQ, 8:16] * 2.0
    ok = np.array_equal(out[lo:lo + SQ, 8:16], want)

    def body(carry, run=run):
        xc, o = carry
        o2 = run(xc, offs)
        dep = (o2[0, 0, 0].astype(jnp.float32) > 1e30).astype(xc.dtype)
        return (xc + dep, o2)

    sec = time_chain(body, (x, jnp.zeros((TOTAL, H, D), jnp.bfloat16)),
                     inner=8, trials=3, hint_sec=1e-4)
    per_win = sec / REPS * 1e6
    print(f"{name}: {'OK' if ok else 'MISMATCH'} {per_win:.1f} us/window",
          flush=True)
