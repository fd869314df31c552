"""Stage-by-stage timing of the fused render step on the live backend.

Times (per 1M rays): source sampling alone, trace alone, trace+detector
hit, and the full step with each binning strategy, to locate the
bottleneck before optimizing.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from __graft_entry__ import _build_scene
from optrace_tpu.tracer.scene_compile import compile_surface
from optrace_tpu.tracer.trace_core import trace_bundle
from optrace_tpu.tracer.detector import detector_hits, build_segment_mask
from optrace_tpu.ops import binning

N = 1_000_000
EXT = (-3.0, 3.0, -3.0, 3.0)
NX = NY = 945


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    RT = _build_scene()
    RT.rays.init(RT.ray_sources, N, len(RT.tracing_surfaces) + 2, RT.no_pol)
    steps = RT._build_steps()
    gen = RT._make_source_fn(N)
    outline = tuple(float(v) for v in RT.outline)
    dsurf = RT.detectors[0].surface
    sfns = compile_surface(dsurf)
    det_zmin = float(dsurf.z_min)
    seg_mask = tuple(build_segment_mask(RT._section_z_bounds(), det_zmin,
                                        float(dsurf.z_max)))

    key = jax.random.PRNGKey(0)

    @jax.jit
    def f_src(key):
        p, s, pols, w, wl = gen(key)
        return p.sum() + s.sum() + w.sum() + wl.sum()

    @jax.jit
    def f_trace(key):
        k1, k2 = jax.random.split(key)
        p, s, pols, w, wl = gen(k1)
        out = trace_bundle(steps, RT.n0, outline, p, s, pols, w, wl,
                           RT.no_pol, RT.use_hurb, key=k2)
        return out["p"].sum() + out["w"].sum()

    def make_full(bin_fn):
        @jax.jit
        def f(key):
            k1, k2 = jax.random.split(key)
            p, s, pols, w, wl = gen(k1)
            out = trace_bundle(steps, RT.n0, outline, p, s, pols, w, wl,
                               RT.no_pol, RT.use_hurb, key=k2)
            ph, wsel, is_hit, _ = detector_hits(sfns, det_zmin, out["p"],
                                                out["w"], segment_mask=seg_mask)
            wm = jnp.where(is_hit, wsel, 0.0)
            return bin_fn(ph[:, 0], ph[:, 1], wm, out["wl"], NX, NY, EXT)
        return f

    print("backend:", jax.devices()[0].platform, flush=True)
    print(f"src-only        : {timeit(f_src, key)*1e3:8.2f} ms", flush=True)
    print(f"src+trace       : {timeit(f_trace, key)*1e3:8.2f} ms", flush=True)
    print(f"full scatter    : {timeit(make_full(binning.bin_xyzw), key)*1e3:8.2f} ms", flush=True)
    print(f"full sorted     : {timeit(make_full(binning.bin_xyzw_sorted), key)*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
