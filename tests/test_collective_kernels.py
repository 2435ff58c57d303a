"""Tests for the Pallas fused AllReduce+Residual+RMSNorm kernels.

Each config runs in a fresh subprocess: the multi-device TPU interpreter
(pltpu.InterpretParams) occasionally deadlocks on host-callback thread
scheduling, independent of kernel correctness — a hung subprocess is
retried and, if persistent, skipped with a note (the kernel logic itself is
deterministic; the flake is in the simulator's thread scheduling).
"""

import subprocess
import sys
import textwrap

import pytest

_SCRIPT = textwrap.dedent(
    """
    import os
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count={ws}"
    os.environ.pop("JAX_PLATFORMS", None)
    import numpy as np, jax, jax.numpy as jnp
    # a sitecustomize-registered remote-TPU plugin forces jax_platforms to
    # itself; force CPU back so a dead tunnel can't hang the subprocess
    # (same rationale as conftest.py)
    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh, PartitionSpec as P
    import sys; sys.path.insert(0, {repo!r})
    from hpc_ops_tpu.parallel.collective_kernels import (
        fuse_allreduce_rmsnorm_pallas,
    )
    from hpc_ops_tpu.parallel.collectives import fuse_allreduce_rmsnorm_ref

    ws, n, h, mode, skew = {ws}, {n}, {h}, {mode!r}, {skew}
    devs = jax.devices("cpu")[:ws]
    mesh = Mesh(np.array(devs), ("tp",))
    rng = np.random.RandomState(0)
    xp = jnp.asarray(rng.randn(ws, n, h), jnp.bfloat16)
    res = jnp.asarray(rng.randn(n, h), jnp.bfloat16)
    w = jnp.asarray(rng.rand(h), jnp.bfloat16)
    f = jax.shard_map(
        lambda xp_, res_: fuse_allreduce_rmsnorm_pallas(
            xp_[0], res_, w, ws=ws, axis_name="tp", mode=mode,
            interpret=True, skew=skew,
        ),
        mesh=mesh,
        in_specs=(P("tp", None, None), P(None, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    out, ores = jax.jit(f)(xp, res)
    want, want_res = fuse_allreduce_rmsnorm_ref(xp, res, w)
    e1 = float(np.abs(np.asarray(out, np.float32) - np.asarray(want, np.float32)).max())
    e2 = float(
        np.abs(np.asarray(ores, np.float32) - np.asarray(want_res, np.float32)).max()
    )
    assert e1 < 0.05, f"out err {{e1}}"
    assert e2 < 0.05, f"res err {{e2}}"
    print("PASS", e1, e2)
    """
)


_RESULTS: dict = {}  # (ws, mode) -> "pass" | "flake"


def _run_case(ws, n, h, mode, tries=4, timeout=240, skew=0):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _SCRIPT.format(ws=ws, n=n, h=h, mode=mode, repo=repo, skew=skew)
    last = None
    for attempt in range(tries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                timeout=timeout + 60 * attempt,  # rising budget per retry
            )
        except subprocess.TimeoutExpired:
            last = "deadlock (interpreter thread-scheduling flake)"
            continue
        if r.returncode == 0 and "PASS" in r.stdout:
            _RESULTS[(ws, mode)] = "pass"
            return
        # a wrong result / crash is NEVER retried away — fail loudly
        raise AssertionError(
            f"collective kernel failed (rc={r.returncode}):\n"
            f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
        )
    _RESULTS[(ws, mode)] = "flake"
    pytest.skip(f"interpreter flake after {tries} tries: {last}")


@pytest.mark.parametrize("mode", ["one_shot", "two_shot"])
def test_fuse_allreduce_rmsnorm_pallas_ws4(mode):
    _run_case(4, 32, 256, mode)


def test_fuse_allreduce_rmsnorm_pallas_ws8():
    _run_case(8, 64, 256, "two_shot")


@pytest.mark.parametrize("mode", ["one_shot", "two_shot"])
def test_fuse_allreduce_rmsnorm_pallas_skewed_arrival(mode):
    """Staggered per-chip delays before the sends (chip r spins ~r*4000 VPU
    passes) exercise the progressive-arrival consumption path: peer slabs
    land out of order and each is reduced as its semaphore fires (the
    reference's Lamport low-latency test structure)."""
    _run_case(4, 32, 256, mode, skew=4000)


def test_zz_collective_coverage():
    """Meta-check (runs last): simulator flakes may skip individual
    configs, but a run where EVERY config skipped cannot distinguish a
    scheduling flake from a real semaphore deadlock in the kernels — fail
    in that case instead of silently passing a suite of skips."""
    assert _RESULTS, "no collective configs executed"
    passed = [k for k, v in _RESULTS.items() if v == "pass"]
    assert passed, (
        f"all {len(_RESULTS)} collective-kernel configs timed out — "
        f"treat as a real deadlock, not a flake: {_RESULTS}"
    )
    # both schedules must be proven at least once across the matrix
    modes_passed = {m for (_, m) in passed}
    assert modes_passed == {"one_shot", "two_shot"}, (
        f"schedules verified: {modes_passed} — the missing one only "
        f"skipped; rerun or debug before trusting it"
    )
