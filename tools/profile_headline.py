"""Phase-by-phase wall timing of the benchmark headline on the live
backend: scene build, ray-storage init, trace compile, trace steady-state.
Identifies whether bench time goes to host-side scene building, XLA
compile (cold cache), or device compute."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

t0 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter() - t0:8.1f}s] {msg}", flush=True)


stamp(f"backend={jax.default_backend()}")

import bench  # noqa: E402

stamp("imports done")
RT = bench.build_microscope() if os.path.isdir(bench.RES) else bench.build_synthetic()
stamp(f"scene built: {len(RT.tracing_surfaces)} tracing surfaces")

N = 1_000_000
nt = len(RT.tracing_surfaces) + 2
RT.rays.init(RT.ray_sources, N, nt, RT.no_pol)
stamp("ray storage init")

fn = RT._get_trace_fn(N)
stamp("trace fn constructed (traced/lowered lazily)")

out = fn(jax.random.PRNGKey(0))
jax.block_until_ready(out)
stamp("first call (compile + run) done")

for i in range(3):
    t1 = time.perf_counter()
    out = fn(jax.random.PRNGKey(i + 1))
    jax.block_until_ready(out)
    stamp(f"steady-state rep {i}: {time.perf_counter() - t1:.3f}s "
          f"(= {(time.perf_counter() - t1) / len(RT.tracing_surfaces) * 1000:.2f} ms/surface/Mray)")
