"""Probe the Mosaic capabilities the 3D-native prefill kernel rests on:
1. HBM->VMEM async copy of [SQ, 8, D] from [total, H, D] at an ARBITRARY
   (non-8-aligned) dynamic row offset (dim 0 untiled) and a dynamic head
   offset that is a provable multiple of 8 (pl.multiple_of).
2. Static single-head reads (sublane-tiled dim 1) of 3D VMEM scratch.
3. VMEM->HBM copy of [TQ, 8, D] at arbitrary dynamic row offsets on both
   source (VMEM dim 0) and destination (HBM dim 0) + the same 8-aligned
   dynamic head offset on the destination.
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

TOTAL, H, D, SQ, TQ, HPP = 512, 16, 128, 128, 32, 8


def kernel(off_ref, x_hbm, o_hbm, q_buf, qs_buf, o_stage, sem_in, sem_out):
    off = off_ref[0]          # arbitrary row offset, e.g. 13
    hb = off_ref[1]           # head-block index (offset hb*8: provable x8)
    src_off = off_ref[2]      # dynamic VMEM dim0 offset, e.g. 5
    dst_off = off_ref[3]      # arbitrary HBM dst row

    h0 = pl.multiple_of(hb * HPP, HPP)
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(off, SQ), pl.ds(h0, HPP)], q_buf, sem_in
    )
    cp.start()
    cp.wait()

    # 2. static per-head extraction into a lane-packed tile and back
    for j in range(HPP):
        qs_buf[:, j * D:(j + 1) * D] = q_buf[:, j, :] * 2.0
    for j in range(HPP):
        o_stage[:, j, :] = qs_buf[:, j * D:(j + 1) * D]

    # 3. dynamic-offset partial write
    ocp = pltpu.make_async_copy(
        o_stage.at[pl.ds(src_off, TQ)],
        o_hbm.at[pl.ds(dst_off, TQ), pl.ds(h0, HPP)],
        sem_out,
    )
    ocp.start()
    ocp.wait()


@functools.partial(jax.jit, static_argnames=())
def run(x, offs):
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((SQ, HPP, D), jnp.bfloat16),
                pltpu.VMEM((SQ, HPP * D), jnp.bfloat16),
                pltpu.VMEM((SQ, HPP, D), jnp.bfloat16),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((TOTAL, H, D), jnp.bfloat16),
    )(offs, x)


x = jnp.arange(TOTAL * H * D, dtype=jnp.float32).reshape(TOTAL, H, D) % 997
x = x.astype(jnp.bfloat16)
offs = jnp.array([13, 1, 5, 77], jnp.int32)
out = np.asarray(run(x, offs), np.float32)
xe = np.asarray(x, np.float32) * 2.0
want = xe[13 + 5:13 + 5 + TQ, 8:16, :]
got = out[77:77 + TQ, 8:16, :]
ok = np.array_equal(got, want)
print("PROBE3D", "OK" if ok else "MISMATCH", got.shape)
