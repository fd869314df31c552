"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding tests emulate a TPU pod slice via
``--xla_force_host_platform_device_count=8`` (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).

IMPORTANT: the environment ships a TPU tunnel plugin ("axon") activated via
JAX_PLATFORMS=axon and PYTHONPATH=/root/.axon_site. Its remote-compile path
makes every XLA compile take ~10 s and can wedge entirely. Tests must run
on the in-process CPU backend, so we force-override the platform and strip
the plugin from the import path BEFORE jax is imported.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# remove the axon TPU tunnel plugin from the path (see module docstring)
_AXON_SITE = "/root/.axon_site"
sys.path[:] = [p for p in sys.path if _AXON_SITE not in p]
if _AXON_SITE in os.environ.get("PYTHONPATH", ""):
    os.environ["PYTHONPATH"] = ":".join(
        p for p in os.environ["PYTHONPATH"].split(":") if _AXON_SITE not in p)

import jax  # noqa: E402

# a sitecustomize.py may have imported jax (and registered the TPU tunnel
# plugin) before this conftest ran, in which case the env mutations above
# came too late — force the platform through the live config instead
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
    config.addinivalue_line("markers", "oracle: compares against the reference package")
