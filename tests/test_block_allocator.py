"""Tests for the native paged-KV block allocator (runtime/block_allocator.cc)."""

import numpy as np
import pytest

from hpc_ops_tpu.runtime import PagedBlockAllocator


def test_extend_and_table():
    a = PagedBlockAllocator(num_blocks=16, block_size=4)
    assert a.num_free == 16
    assert a.extend(1, 5) == 2  # 5 tokens -> 2 blocks of 4
    assert a.num_free == 14
    assert a.length(1) == 5
    t = a.table(1)
    assert t.shape == (2,) and len(set(t.tolist())) == 2
    # growing within the last block allocates nothing
    assert a.extend(1, 8) == 2
    assert a.num_free == 14
    assert a.extend(1, 9) == 3
    assert a.num_free == 13
    # table is stable as a prefix
    t2 = a.table(1)
    assert t2[:2].tolist() == t.tolist()
    assert a.free(1) == 3
    assert a.num_free == 16


def test_pool_exhaustion():
    a = PagedBlockAllocator(num_blocks=2, block_size=4)
    a.extend(1, 8)
    with pytest.raises(MemoryError):
        a.extend(2, 1)
    # failure must not leak a phantom sequence
    with pytest.raises(KeyError):
        a.table(2)
    a.free(1)
    assert a.extend(2, 1) == 1


def test_fork_refcounts_and_cow():
    a = PagedBlockAllocator(num_blocks=8, block_size=4)
    a.extend(10, 8)  # 2 blocks
    assert a.fork(10, 11) == 2
    assert a.num_free == 6  # shared, nothing new allocated
    assert a.table(11).tolist() == a.table(10).tolist()

    # child decodes: its tail block must become exclusive
    blk, copied_from = a.cow_last(11)
    assert copied_from == a.table(10)[-1]
    assert blk != copied_from
    assert a.table(11)[-1] == blk
    assert a.num_free == 5

    # parent's tail is now exclusive again -> no copy
    blk_p, copied_p = a.cow_last(10)
    assert copied_p == -1 and blk_p == a.table(10)[-1]

    # freeing the parent releases only its exclusive tail + shared prefix ref
    a.free(10)
    assert a.num_free == 6  # shared block 0 still held by child
    a.free(11)
    assert a.num_free == 8


def test_padded_table():
    a = PagedBlockAllocator(num_blocks=8, block_size=2)
    a.extend(5, 3)
    t = a.table(5, pad_to=6)
    assert t.shape == (6,)
    # padding must be -1, not 0: page 0 is a real pool page, and the
    # negative sentinel is what every kernel path masks/drops
    assert np.all(t[2:] == -1)
    assert np.all(t[:2] >= 0)
