"""Test configuration: CPU-only JAX with 8 virtual devices and float64.

Must set env vars before jax is imported anywhere.
"""

import os
import sys
import types

# The tunneled-TPU ("axon") PJRT plugin lives on PYTHONPATH and connects to
# its local relay at jax import even when the platform is forced to CPU; a
# wedged relay session then hangs the whole test process on a futex.  Tests
# are CPU-only, so drop the plugin's site dir before jax can discover it
# (and scrub PYTHONPATH for subprocess-spawning tests).
sys.path[:] = [p for p in sys.path if 'axon_site' not in p]
if 'axon_site' in os.environ.get("PYTHONPATH", ""):
    os.environ["PYTHONPATH"] = os.pathsep.join(
        p for p in os.environ["PYTHONPATH"].split(os.pathsep)
        if 'axon_site' not in p)

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even if env sets a TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# A pytest plugin may import jax before this conftest runs, so the env vars
# alone aren't enough -- force the platform through the config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="session")
def ref_pygsti():
    """Import the reference pyGSTi (pure-Python evotypes) as a parity oracle."""
    if not os.path.isdir(REFERENCE_PATH):
        pytest.skip("reference pyGSTi not available")
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    if "pygsti._version" not in sys.modules:
        vm = types.ModuleType("pygsti._version")
        vm.version = "0.0.0"
        vm.version_tuple = (0, 0, 0)
        sys.modules["pygsti._version"] = vm
    os.environ.setdefault("PYGSTI_NO_CYTHON_WARNING", "1")
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import pygsti
    return pygsti
