"""Test configuration: CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual device mesh exactly as the
driver's dryrun_multichip does; numerical tests need float64, which the
package enables on import.

The JAX_PLATFORMS env var is NOT sufficient here: a sitecustomize-installed
TPU-tunnel plugin may force ``jax_platforms`` via jax.config at interpreter
startup (before conftest runs), which overrides the env var and routes every
test compile through the remote TPU tunnel.  jax.config.update after import
wins over both, so that's what we use.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent compilation cache: the solver while_loop is expensive to
# compile; repeat test runs hit the disk cache.  Disable with
# EICOS_TPU_NO_COMPILE_CACHE=1.
if not os.environ.get("EICOS_TPU_NO_COMPILE_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Drop jit caches between test modules.

    The full suite deterministically segfaults INSIDE XLA:CPU (4/4 runs,
    always at the first test of the 16th module, both in
    backend_compile_and_load on a cold disk cache and in
    deserialize_executable on a warm one) once ~190 tests' executables
    are live in one process; any half of the suite passes.  Bounding the
    number of live executables per process avoids the crash; cross-module
    executable reuse is rare (different problem structures), and the
    persistent disk cache makes the re-JITs cheap."""
    yield
    jax.clear_caches()
