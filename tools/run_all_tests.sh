#!/usr/bin/env bash
# Full test gate (VERDICT r3 #5): fast suite + slow/oracle suite, one command.
#
# The default pytest gate (`python -m pytest tests/ -x -q`) excludes tests
# marked `slow` (pytest.ini addopts). Those slow tests are the strongest in
# the repo — the f32 error-budget, the microscope-image parity vs the
# reference, the edge-Fresnel HURB calibration, and the double_gauss /
# microscope example runs. This script runs EVERYTHING, reusing the
# persistent XLA compile cache so reruns are cheap.
#
# Usage:  bash tools/run_all_tests.sh            # full gate
#         bash tools/run_all_tests.sh --fast     # fast suite only
#
# Mirrors the reference's batched gate (/root/reference/tox.toml:1-46),
# which also splits fast/slow/gui legs.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"

rc=0

echo "=== fast suite (default gate) ==="
python -m pytest tests/ -q || rc=1

if [ "${1:-}" != "--fast" ]; then
    echo "=== slow suite (error budgets, reference parity, heavy examples) ==="
    python -m pytest tests/ -q -m slow || rc=1
fi

if [ $rc -eq 0 ]; then
    echo "ALL TEST LEGS PASSED"
else
    echo "TEST GATE FAILED (rc=$rc)" >&2
fi
exit $rc
