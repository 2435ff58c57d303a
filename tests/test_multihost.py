"""Multi-host serving: ShardedEngine over a hybrid (ddp x dp x tp) mesh.

BASELINE config 5 (TP across hosts + cross-host continuous batching),
validated on the virtual CPU mesh: 2 "hosts" (ddp, the DCN axis) x 4
devices (tp, the ICI axis). Greedy generation must be identical to the
single-device Engine on the same model — continuous batching across hosts
is a scheduling concern, not a numerics one.
"""

import numpy as np
import pytest

import jax

from hpc_ops_tpu.utils.common import set_interpret_override


def _cpu_devices(n):
    cpus = jax.devices("cpu")
    if len(cpus) < n:
        pytest.skip(f"need {n} virtual CPU devices")
    return cpus[:n]


def test_sharded_engine_hybrid_mesh_matches_single_device():
    from hpc_ops_tpu.models.llama import init_weights, tiny_config
    from hpc_ops_tpu.parallel.mesh import make_hybrid_mesh
    from hpc_ops_tpu.runtime.engine import Engine
    from hpc_ops_tpu.runtime.sharded_engine import ShardedEngine

    devices = _cpu_devices(8)
    cfg = tiny_config()  # dense; kv_heads=4 shards over tp=4
    with jax.default_device(devices[0]):
        weights = init_weights(jax.random.PRNGKey(3), cfg)

        prompts = [
            [1, 2, 3, 4, 5],
            [7, 8, 9],
            [11, 12, 13, 14, 15, 16, 17],
            [21, 22],
            [31],
        ]

        set_interpret_override(True)
        try:
            single = Engine(
                cfg, weights, num_blocks=64, block_size=16, max_batch=4,
                max_blocks_per_seq=4,
            )
            want = single.run([list(p) for p in prompts], max_new=6)

            mesh = make_hybrid_mesh(
                dcn_dp=2, tp=4, dp=1, devices=devices
            )
            eng = ShardedEngine(
                cfg, weights, mesh, num_blocks=64, block_size=16,
                max_batch=4, max_blocks_per_seq=4,
            )
            got = eng.run([list(p) for p in prompts], max_new=6)
        finally:
            set_interpret_override(None)

    assert got == want, f"sharded {got} != single {want}"


def test_sharded_engine_chunked_prefill_matches_oneshot():
    """Chunked prefill on the hybrid mesh is token-identical to one-shot
    prefill: chunk rounds write the same KV (incremental prefill is exact)
    and decode interleaving only reorders scheduling, not numerics."""
    from hpc_ops_tpu.models.llama import init_weights, tiny_config
    from hpc_ops_tpu.parallel.mesh import make_hybrid_mesh
    from hpc_ops_tpu.runtime.sharded_engine import ShardedEngine

    devices = _cpu_devices(8)
    cfg = tiny_config()
    with jax.default_device(devices[0]):
        weights = init_weights(jax.random.PRNGKey(3), cfg)

        prompts = [
            list(range(1, 12)),  # 11 tokens -> 3 chunks of <=4
            [7, 8, 9],
            list(range(20, 29)),  # 9 tokens -> 3 chunks
            [41, 42],
        ]

        set_interpret_override(True)
        try:
            mesh = make_hybrid_mesh(dcn_dp=2, tp=4, dp=1, devices=devices)
            base = ShardedEngine(
                cfg, weights, mesh, num_blocks=64, block_size=16,
                max_batch=4, max_blocks_per_seq=4,
            )
            want = base.run([list(p) for p in prompts], max_new=5)

            chunked = ShardedEngine(
                cfg, weights, mesh, num_blocks=64, block_size=16,
                max_batch=4, max_blocks_per_seq=4, prefill_chunk=4,
            )
            got = chunked.run([list(p) for p in prompts], max_new=5)
        finally:
            set_interpret_override(None)

    assert got == want, f"chunked {got} != one-shot {want}"


def test_sharded_engine_multi_step_matches_single():
    """Fused multi-step decode over the hybrid mesh is token-identical to
    single-step sharded serving (greedy); surplus fused tokens past
    max_new are truncated."""
    from hpc_ops_tpu.models.llama import init_weights, tiny_config
    from hpc_ops_tpu.parallel.mesh import make_hybrid_mesh
    from hpc_ops_tpu.runtime.sharded_engine import ShardedEngine

    devices = _cpu_devices(8)
    cfg = tiny_config()
    with jax.default_device(devices[0]):
        weights = init_weights(jax.random.PRNGKey(3), cfg)
        prompts = [[1, 2, 3, 4, 5], [7, 8, 9], [21, 22], [31]]

        set_interpret_override(True)
        try:
            mesh = make_hybrid_mesh(dcn_dp=2, tp=4, dp=1, devices=devices)
            base = ShardedEngine(
                cfg, weights, mesh, num_blocks=64, block_size=16,
                max_batch=4, max_blocks_per_seq=4,
            )
            want = base.run([list(p) for p in prompts], max_new=5)
            fused = ShardedEngine(
                cfg, weights, mesh, num_blocks=64, block_size=16,
                max_batch=4, max_blocks_per_seq=4, multi_step=3,
            )
            got = fused.run([list(p) for p in prompts], max_new=5)
        finally:
            set_interpret_override(None)

    assert got == want, f"multi-step {got} != single {want}"


def test_sharded_engine_rejects_oversized_request():
    from hpc_ops_tpu.models.llama import init_weights, tiny_config
    from hpc_ops_tpu.parallel.mesh import make_hybrid_mesh
    from hpc_ops_tpu.runtime.sharded_engine import ShardedEngine

    devices = _cpu_devices(8)
    cfg = tiny_config()
    with jax.default_device(devices[0]):
        weights = init_weights(jax.random.PRNGKey(0), cfg)
        mesh = make_hybrid_mesh(dcn_dp=2, tp=4, dp=1, devices=devices)
        eng = ShardedEngine(
            cfg, weights, mesh, num_blocks=64, block_size=16, max_batch=2,
            max_blocks_per_seq=2,
        )
        with pytest.raises(ValueError, match="KV slots"):
            eng.add_request(list(range(100)), max_new=8)


def test_sharded_engine_stop_tokens():
    """Stop tokens end requests early on the sharded engine too (single-
    and multi-step decode)."""
    from hpc_ops_tpu.models.llama import init_weights, tiny_config
    from hpc_ops_tpu.parallel.mesh import make_hybrid_mesh
    from hpc_ops_tpu.runtime.sharded_engine import ShardedEngine

    devices = _cpu_devices(8)
    cfg = tiny_config()
    with jax.default_device(devices[0]):
        weights = init_weights(jax.random.PRNGKey(3), cfg)
        prompts = [[1, 2, 3, 4, 5], [7, 8, 9]]
        set_interpret_override(True)
        try:
            mesh = make_hybrid_mesh(dcn_dp=2, tp=4, dp=1, devices=devices)
            base = ShardedEngine(
                cfg, weights, mesh, num_blocks=64, block_size=16,
                max_batch=2, max_blocks_per_seq=4,
            )
            full = base.run([list(p) for p in prompts], max_new=6)
            stop = full[0][2]
            for ms in (1, 3):
                eng = ShardedEngine(
                    cfg, weights, mesh, num_blocks=64, block_size=16,
                    max_batch=2, max_blocks_per_seq=4, multi_step=ms,
                    stop_tokens=[stop],
                )
                outs = eng.run([list(p) for p in prompts], max_new=6)
                assert outs[0] == full[0][:3], f"ms={ms}: {outs[0]}"
        finally:
            set_interpret_override(None)


def test_sharded_engine_int8_kv():
    """The quantized serving mode (fused int8 K|V slab) constructs and
    serves on the hybrid mesh, token-identical to the single-device
    int8 engine."""
    from hpc_ops_tpu.models.llama import init_weights, tiny_config
    from hpc_ops_tpu.parallel.mesh import make_hybrid_mesh
    from hpc_ops_tpu.runtime.engine import Engine
    from hpc_ops_tpu.runtime.sharded_engine import ShardedEngine

    devices = _cpu_devices(8)
    cfg = tiny_config(int8_kv=True, kv_scale=0.02)
    with jax.default_device(devices[0]):
        weights = init_weights(jax.random.PRNGKey(1), cfg)
        prompts = [[1, 2, 3], [7, 8], [9, 10, 11], [21]]
        set_interpret_override(True)
        try:
            single = Engine(
                cfg, weights, num_blocks=64, block_size=16, max_batch=4,
                max_blocks_per_seq=4,
            )
            want = single.run([list(p) for p in prompts], max_new=4)
            mesh = make_hybrid_mesh(dcn_dp=2, tp=4, dp=1, devices=devices)
            eng = ShardedEngine(
                cfg, weights, mesh, num_blocks=64, block_size=16,
                max_batch=4, max_blocks_per_seq=4,
            )
            got = eng.run([list(p) for p in prompts], max_new=4)
        finally:
            set_interpret_override(None)
    assert got == want, f"sharded int8 {got} != single {want}"


def test_sharded_engine_logprobs():
    """Per-token logprobs on the sharded engine: one per output token and
    matching the single-device engine's values (greedy)."""
    from hpc_ops_tpu.models.llama import init_weights, tiny_config
    from hpc_ops_tpu.parallel.mesh import make_hybrid_mesh
    from hpc_ops_tpu.runtime.engine import Engine
    from hpc_ops_tpu.runtime.sharded_engine import ShardedEngine

    devices = _cpu_devices(8)
    cfg = tiny_config()
    with jax.default_device(devices[0]):
        weights = init_weights(jax.random.PRNGKey(3), cfg)
        prompts = [[1, 2, 3, 4], [7, 8]]
        single = Engine(
            cfg, weights, num_blocks=64, block_size=16, max_batch=2,
            max_blocks_per_seq=4, logprobs=True,
        )
        want = single.run([list(p) for p in prompts], max_new=4)
        set_interpret_override(True)
        try:
            mesh = make_hybrid_mesh(dcn_dp=2, tp=4, dp=1, devices=devices)
            for ms in (1, 3):
                eng = ShardedEngine(
                    cfg, weights, mesh, num_blocks=64, block_size=16,
                    max_batch=2, max_blocks_per_seq=4, multi_step=ms,
                    logprobs=True,
                )
                outs = eng.run([list(p) for p in prompts], max_new=4)
                assert outs == want
                for rid in range(2):
                    np.testing.assert_allclose(
                        eng.requests[rid].logprobs,
                        single.requests[rid].logprobs,
                        rtol=5e-2, atol=5e-2,
                    )
        finally:
            set_interpret_override(None)


def test_sharded_engine_temperature_sampling():
    """Temperature sampling on the sharded engine: deterministic for a
    fixed seed, diverse across steps (no replayed noise), valid tokens,
    on both decode modes."""
    from hpc_ops_tpu.models.llama import init_weights, tiny_config
    from hpc_ops_tpu.parallel.mesh import make_hybrid_mesh
    from hpc_ops_tpu.runtime.sharded_engine import ShardedEngine

    devices = _cpu_devices(8)
    cfg = tiny_config()
    with jax.default_device(devices[0]):
        weights = init_weights(jax.random.PRNGKey(3), cfg)
        prompts = [[1, 2, 3], [7, 8]]
        set_interpret_override(True)
        try:
            mesh = make_hybrid_mesh(dcn_dp=2, tp=4, dp=1, devices=devices)
            outs = {}
            for ms in (1, 3):
                runs = []
                for _ in range(2):
                    eng = ShardedEngine(
                        cfg, weights, mesh, num_blocks=64, block_size=16,
                        max_batch=2, max_blocks_per_seq=4, multi_step=ms,
                        temperature=1.0, seed=11,
                    )
                    runs.append(eng.run([list(p) for p in prompts],
                                        max_new=8))
                assert runs[0] == runs[1], f"ms={ms} not deterministic"
                outs[ms] = runs[0]
                for o in runs[0]:
                    assert len(o) == 8
                    assert all(0 <= t < cfg.vocab for t in o)
                    assert len(set(o)) >= 3, f"degenerate: {o}"
        finally:
            set_interpret_override(None)
