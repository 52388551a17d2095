"""Test environment: run everything on a virtual 8-device CPU mesh so sharded
code paths are exercised without TPU hardware."""

import os

# Force CPU: the ambient environment may point JAX at a tunneled TPU
# (JAX_PLATFORMS=axon), which is far too slow for unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Run torch-importing tests LAST (test_lpips imports torch at function
    scope): torch and jaxlib each bundle a private LLVM, and keeping torch out
    of the process until every other module's XLA compiles are done removes
    one whole class of symbol-collision hazards."""
    items.sort(key=lambda it: it.fspath.basename == "test_lpips.py")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    The full suite compiles hundreds of XLA:CPU programs in one process; once
    enough accumulated, the NEXT large compile segfaulted inside
    `backend_compile_and_load` — deterministically at the same test given the
    same prefix, passing when either half of the prefix ran alone (so it is
    cumulative compiler state, not any single test's doing). Dropping jit
    caches at module teardown keeps resident JIT code bounded; modules re-pay
    shared-program compiles, which is noise next to the suite's own compile
    load."""
    yield
    import jax

    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
