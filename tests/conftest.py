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
