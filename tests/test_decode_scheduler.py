"""Tests for the dynamic decode scheduler and the task-scheduled decode path
(reference: CPU<->CUDA scheduler equivalence, SURVEY.md §4; dynamic decode
scenarios of benchmark/attention_decode/README.md)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hpc_ops_tpu.ops.attention import attention_decode
from hpc_ops_tpu.ops.attention.scheduler import (
    assign_attention_decode_task,
    assign_decode_tasks_jnp,
    assign_decode_tasks_native,
    assign_decode_tasks_np,
    task_capacity,
)
from hpc_ops_tpu.utils.testing import assert_allclose
from tests.test_attention_decode import make_decode_case, np_decode_ref


@pytest.mark.parametrize(
    "kv_lens",
    [
        [512] * 8,
        [65536, 4096, 4096, 128],  # skewed mix (reference one_64k scenario)
        [1],
        [0, 33],
    ],
)
def test_scheduler_impl_equivalence(kv_lens):
    """numpy, native C++, and jnp schedulers produce identical task maps."""
    h = 4
    kv = np.asarray(kv_lens, np.int32)
    cap = task_capacity(len(kv_lens), max(max(kv_lens), 1), h, 512, 8)

    np_out = assign_decode_tasks_np(kv, h, cap)
    nat_out = assign_decode_tasks_native(kv, h, cap)
    jnp_out = assign_decode_tasks_jnp(jnp.asarray(kv), h, cap)

    assert np_out[5] == nat_out[5] == int(jnp_out.num_tasks)
    n = np_out[5]
    for i, name in enumerate(["batch", "head", "tile_start", "num_tiles", "seg"]):
        np.testing.assert_array_equal(np_out[i][:n], nat_out[i][:n], err_msg=name)
        np.testing.assert_array_equal(
            np_out[i][:n], np.asarray(getattr(jnp_out, name))[:n], err_msg=name
        )
    # sentinel tail
    assert np.all(np.asarray(jnp_out.batch)[n:] == -1)


def test_scheduler_covers_all_tiles():
    kv = np.asarray([1000, 64, 8192], np.int32)
    h = 2
    cap = task_capacity(3, 8192, h, 512, 1)
    tm = assign_decode_tasks_jnp(jnp.asarray(kv), h, cap, tile=512, min_process_len=512)
    n = int(tm.num_tasks)
    covered = {}
    for t in range(n):
        key = (int(tm.batch[t]), int(tm.head[t]))
        covered.setdefault(key, 0)
        covered[key] += int(tm.num_tiles[t])
    for b in range(3):
        tiles = max(-(-int(kv[b]) // 512), 1)
        for hh in range(h):
            assert covered[(b, hh)] == tiles


@pytest.mark.parametrize("kv_lens,mtp", [([300, 17], 0), ([1500, 40, 256], 1)])
def test_attention_decode_with_task_map(kv_lens, mtp):
    """Task-scheduled decode == static-grid decode == numpy oracle."""
    sq = mtp + 1
    q, kc, vc, block_ids, kv_lens_np = make_decode_case(13, kv_lens, sq=sq, bs=16)

    want = np_decode_ref(
        np.asarray(q, np.float32),
        np.asarray(kc, np.float32),
        np.asarray(vc, np.float32),
        np.asarray(block_ids),
        kv_lens_np,
        sq,
    )

    tile = 128  # page-aligned (bs=16)
    cap = task_capacity(len(kv_lens), max(kv_lens), 2, tile, 1)
    tm = assign_attention_decode_task(
        jnp.asarray(kv_lens_np), 2, mtp=mtp, new_kv_included=True,
        min_process_len=tile, capacity=cap, tile=tile, num_tasks_target=8,
    )
    out = attention_decode(
        q, kc, vc, block_ids, jnp.asarray(kv_lens_np),
        mtp=mtp, new_kv_included=True, task_map=tm, task_tile=tile,
    )
    assert_allclose(
        np.asarray(out, np.float32), want, atol=3e-2, rtol=3e-2, name="task_map"
    )
