"""Record/replay harness test (reference analog: conftest.py TraceHook +
sanitizer replays, SURVEY.md §5)."""

import jax
import jax.numpy as jnp

import hpc_ops_tpu.ops.activation as act_mod
from hpc_ops_tpu.utils.replay import TraceHook, replay_record


def test_record_and_replay(tmp_path):
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 512), jnp.bfloat16)
    scale = jnp.array([1.3], jnp.float32)

    with TraceHook([act_mod.act_mul_and_quant], out_dir=str(tmp_path)) as hook:
        out = act_mod.act_mul_and_quant(x, scale)
    assert len(hook.records) == 1
    rec = hook.records[0]
    assert rec.path.endswith(".pkl")

    # replay from the in-memory record and from disk
    replay_record(rec)
    replay_record(rec.path)
