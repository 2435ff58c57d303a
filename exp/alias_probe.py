"""Probe: input_output_aliases index convention under PrefetchScalarGridSpec.

A kernel that DMA-writes row `slot[i]` of an ANY-space cache, aliased
input->output. Checks untouched rows pass through. Tries both index
conventions (with / without counting scalar-prefetch args).
"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(slots_ref, x_ref, cache_in_ref, cache_out_ref, scr, sem):
    scr[...] = x_ref[...] * 2.0
    s = slots_ref[0]
    cp = pltpu.make_async_copy(scr.at[0], cache_out_ref.at[s], sem)
    cp.start()
    cp.wait()


def run(alias_idx):
    cache = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    x = jnp.ones((1, 128), jnp.float32)
    slots = jnp.array([3], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, 128), lambda i, *_: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        input_output_aliases={alias_idx: 0},
        interpret=True,
    )(slots, x, cache)
    out = np.asarray(out)
    ok_touched = np.allclose(out[3], 2.0)
    ok_rest = np.allclose(out[0], np.arange(128)) and np.allclose(
        out[7], np.arange(7 * 128, 8 * 128)
    )
    print(f"alias_idx={alias_idx}: touched_ok={ok_touched} passthrough_ok={ok_rest}")


for idx in (1, 2):
    try:
        run(idx)
    except Exception as e:
        print(f"alias_idx={idx}: FAILED {type(e).__name__}: {str(e)[:200]}")
