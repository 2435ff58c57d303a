"""Tests for the continuous-batching serving engine (runtime/engine.py)."""

import jax
import numpy as np
import pytest

from hpc_ops_tpu.models.llama import init_weights, tiny_config
from hpc_ops_tpu.runtime.engine import Engine


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config()
    weights = init_weights(jax.random.PRNGKey(0), cfg)
    return cfg, weights


def test_engine_batch_matches_solo(model):
    cfg, weights = model
    prompts = [[1, 2, 3, 4, 5], [7, 8], [9, 10, 11]]

    eng = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=4)
    batch_out = eng.run(prompts, max_new=4)

    solo_out = []
    for p in prompts:
        e1 = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=1)
        solo_out.append(e1.run([p], max_new=4)[0])

    assert batch_out == solo_out
    for out in batch_out:
        assert len(out) == 4
        assert all(0 <= t < cfg.vocab for t in out)


def test_engine_streams_and_frees(model):
    cfg, weights = model
    eng = Engine(cfg, weights, num_blocks=32, block_size=16, max_batch=2)
    free0 = eng.alloc.num_free
    r1 = eng.add_request([1, 2, 3], max_new=2)
    r2 = eng.add_request([4, 5], max_new=3)
    while eng.step():
        pass
    assert eng.requests[r1].done and eng.requests[r2].done
    assert len(eng.requests[r1].out) == 2
    assert len(eng.requests[r2].out) == 3
    # all sequence blocks returned to the pool
    assert eng.alloc.num_free == free0


def test_engine_more_requests_than_batch(model):
    cfg, weights = model
    eng = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=2)
    outs = eng.run([[1, 2], [3, 4], [5, 6]], max_new=3)
    assert all(len(o) == 3 for o in outs)
