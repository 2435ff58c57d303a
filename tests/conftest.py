"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the TPU analog of the reference's
multi-process multi-GPU tests, see SURVEY.md §4): Pallas kernels execute in
interpreter mode, shardings/collectives execute for real over the host mesh.
Set HPC_TEST_TPU=1 to run the suite on real TPU devices instead.
"""

import os
import sys

if not os.environ.get("HPC_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("HPC_TEST_TPU"):
    # A remote-TPU PJRT plugin registered at interpreter start (via
    # sitecustomize) forces jax.config jax_platforms to itself, overriding
    # the JAX_PLATFORMS env var set above; when its tunnel is down, its
    # backend init then blocks every jnp op forever. Tests are CPU-only —
    # force the config back at the same (config) level so the remote
    # factory is never initialized and a dead tunnel can't hang the suite.
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: interpret-mode Pallas programs are slow to
# compile; cache them across test runs (repo-local, gitignored).
import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# ---------------------------------------------------------------------------
# HPC_SANITIZER=1: record/replay verification harness — the TPU analog of the
# reference's conftest TraceHook + compute-sanitizer loop (reference
# conftest.py:85-145, SURVEY.md §5). Public ops are wrapped so every call made
# by the suite is recorded; at each test's teardown the new records are
# replayed and checked for (a) bitwise-deterministic outputs across runs and
# (b) agreement with the recorded output (see hpc_ops_tpu/utils/replay.py).
# Replays are capped per op to bound suite runtime.
# ---------------------------------------------------------------------------
if os.environ.get("HPC_SANITIZER"):
    _SANITIZER = {"hook": None, "cursor": 0, "replayed": {}}
    _SANITIZER_OPS = {
        "hpc_ops_tpu.ops.activation": [
            "act_mul_and_quant", "masked_act_mul_and_quant",
        ],
        "hpc_ops_tpu.ops.normalization": ["fused_rmsnorm_with_scale"],
        "hpc_ops_tpu.ops.rope": ["rope_norm_store_kv"],
        "hpc_ops_tpu.ops.sampler": ["fused_sampler"],
        "hpc_ops_tpu.ops.gemm": ["gemm_bf16xfp32"],
        "hpc_ops_tpu.ops.quant": ["scaled_fp8_quant"],
        "hpc_ops_tpu.ops.group_gemm": ["group_gemm_pertensor_int8"],
    }
    _SANITIZER_MAX_REPLAYS_PER_OP = int(
        os.environ.get("HPC_SANITIZER_MAX_REPLAYS", "2")
    )

    def pytest_configure(config):
        import importlib

        import hpc_ops_tpu
        from hpc_ops_tpu.utils.replay import TraceHook

        fns = []
        for modname, names in _SANITIZER_OPS.items():
            mod = importlib.import_module(modname)
            for n in names:
                if hasattr(mod, n):
                    fns.append(getattr(mod, n))
        hook = TraceHook(fns)
        hook.__enter__()
        # keep the package-level re-exports pointing at the wrappers
        for mod, name, _ in hook._originals:
            if hasattr(hpc_ops_tpu, name):
                setattr(hpc_ops_tpu, name, getattr(mod, name))
        _SANITIZER["hook"] = hook

    def pytest_runtest_teardown(item, nextitem):
        hook = _SANITIZER["hook"]
        if hook is None:
            return
        from hpc_ops_tpu.utils.replay import replay_record

        new = hook.records[_SANITIZER["cursor"]:]
        _SANITIZER["cursor"] = len(hook.records)
        for rec in new:
            key = (rec.module, rec.name)
            count = _SANITIZER["replayed"].get(key, 0)
            try:
                if count < _SANITIZER_MAX_REPLAYS_PER_OP:
                    _SANITIZER["replayed"][key] = count + 1
                    replay_record(rec)
            finally:
                try:
                    os.remove(rec.path)
                except OSError:
                    pass

    def pytest_unconfigure(config):
        hook = _SANITIZER["hook"]
        if hook is None:
            return
        import hpc_ops_tpu

        hook.__exit__(None, None, None)
        for _, name, fn in hook._originals:
            if hasattr(hpc_ops_tpu, name):
                setattr(hpc_ops_tpu, name, fn)
        replayed = sum(_SANITIZER["replayed"].values())
        print(f"\n[HPC_SANITIZER] recorded {len(hook.records)} op calls, "
              f"replayed {replayed} "
              f"({len(_SANITIZER['replayed'])} distinct ops)")
