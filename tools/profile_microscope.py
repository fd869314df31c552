"""Component timing of the benchmark headline on the live backend:
(a) ray generation only, (b) trace without section storage,
(c) full stored trace — isolates where the 57-surface milliseconds go."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from optrace_tpu.tracer.trace_core import trace_bundle  # noqa: E402

N = 1_000_000
t0 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter() - t0:7.1f}s] {msg}", flush=True)


RT = bench.build_microscope() if os.path.isdir(bench.RES) else bench.build_synthetic()
ns = len(RT.tracing_surfaces)
RT.rays.init(RT.ray_sources, N, ns + 2, RT.no_pol)
steps = RT._build_steps()
gen = RT._make_source_fn(N)
outline = tuple(float(v) for v in RT.outline)
stamp(f"scene ready ({ns} surfaces)")


def timeit(fn, label, reps=5):
    out = fn(jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    stamp(f"{label}: compiled")
    t1 = time.perf_counter()
    for i in range(reps):
        out = fn(jax.random.PRNGKey(i + 1))
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t1) / reps
    stamp(f"{label}: {dt * 1000:.1f} ms  ({dt / ns * 1000:.2f} ms/surface/Mray)")
    return dt


@jax.jit
def f_src(key):
    p, s, pols, w, wl = gen(key)
    return p.sum() + s.sum() + w.sum() + wl.sum()


@jax.jit
def f_trace_nostore(key):
    k1, k2 = jax.random.split(key)
    p, s, pols, w, wl = gen(k1)
    out = trace_bundle(steps, RT.n0, outline, p, s, pols, w, wl,
                       RT.no_pol, RT.use_hurb, key=k2, store_sections=False)
    return out["infos"].sum() + out["wl"].sum()


@jax.jit
def f_trace_store(key):
    k1, k2 = jax.random.split(key)
    p, s, pols, w, wl = gen(k1)
    out = trace_bundle(steps, RT.n0, outline, p, s, pols, w, wl,
                       RT.no_pol, RT.use_hurb, key=k2, store_sections=True)
    return out["p"].sum() + out["w"].sum()


t_src = timeit(f_src, "source gen only")
t_ns = timeit(f_trace_nostore, "gen + trace (no store)")
t_st = timeit(f_trace_store, "gen + trace (stored)")
print(f"\nbreakdown per Mray: src {t_src * 1000:.0f} ms | "
      f"trace-compute {(t_ns - t_src) * 1000:.0f} ms | "
      f"section-store overhead {(t_st - t_ns) * 1000:.0f} ms | "
      f"total stored {t_st * 1000:.0f} ms")
print(f"per-step trace compute: {(t_ns - t_src) / (ns + 2) * 1e6:.0f} us")
