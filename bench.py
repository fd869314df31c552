"""Benchmark: double-gauss trace throughput.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload mirrors the reference benchmark semantics (tests/benchmark.py:
time a full trace, normalize by surface count and megarays; reference
headline: 85 ms/surface/Mrays on an 8-core i7-1360P, BASELINE.md). Here
the flagship fused render step (source sampling → 16-surface trace →
detector binning) runs on the available accelerator; lower is better,
``vs_baseline`` is the speedup over the 85 ms figure.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

BASELINE_S_PER_SURFACE_PER_MRAY = 0.085


def main():
    from __graft_entry__ import _build_scene
    from optrace_tpu.parallel.render import make_fused_render

    RT = _build_scene()
    n_surfaces = len(RT.tracing_surfaces)

    N = 1_000_000
    render_one, ext = make_fused_render(RT, N, detector_index=0,
                                        extent=[-3, 3, -3, 3], Nx=945, Ny=945)
    step = jax.jit(render_one)

    key = jax.random.PRNGKey(0)
    # warmup/compile
    img = step(key)
    img.block_until_ready()

    reps = 5
    t0 = time.perf_counter()
    for i in range(reps):
        img = step(jax.random.PRNGKey(i + 1))
    img.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    s_per_surface_per_mray = dt / n_surfaces / (N / 1e6)
    print(json.dumps({
        "metric": "s/surface/Mrays (double_gauss fused render)",
        "value": round(s_per_surface_per_mray, 6),
        "unit": "s",
        "vs_baseline": round(BASELINE_S_PER_SURFACE_PER_MRAY / s_per_surface_per_mray, 2),
    }))


if __name__ == "__main__":
    main()
