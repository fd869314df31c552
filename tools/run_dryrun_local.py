"""Run __graft_entry__.dryrun_multichip the way the driver does: CPU
backend, N virtual devices, axon tunnel plugin stripped. Usage:

    python tools/run_dryrun_local.py [n_devices]

NOTE: the environment's /root/.axon_site/sitecustomize.py imports jax at
interpreter startup (before __main__), so platform overrides must be in
place BEFORE python starts — this script re-execs itself with a scrubbed
environment when needed.
"""
import os
import sys

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8

if "jax" in sys.modules or os.environ.get("JAX_PLATFORMS") != "cpu":
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
               + f" --xla_force_host_platform_device_count={n}")
    env.pop("PYTHONPATH", None)        # drops the axon sitecustomize hook
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__),
                               str(n)], env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as g  # noqa: E402

g.dryrun_multichip(n)
