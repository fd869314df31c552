"""Benchmark: the reference's own headline workload — a 57-surface
microscope (Nikon patent objective + tube + eyepiece + Arizona eye model),
cell-image source with Lambertian divergence, 10⁶ rays, no polarization.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Mirrors /root/reference/tests/benchmark.py semantics: time a full trace
(ray generation + surface-sequential propagation with all per-section
ray state materialized), normalized by surface count and megarays.
Reference headline: 85 ms/surface/Mrays on an 8-core i7-1360P
(docs/source/index.rst:42, BASELINE.md). The reference stores sections in
host RAM; here they are materialized in device HBM, which plays the same
role for a TPU-resident pipeline. Lower is better; ``vs_baseline`` is the
speedup over the 85 ms figure.

If the reference ZEMAX fixtures are not mounted, an equivalent synthetic
57-surface all-spherical stack is used so the workload shape (surface
count, dispersive media, image-source sampling) is preserved.
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
RES = "/root/reference/examples/resources"


def build_microscope():
    """The reference benchmark geometry (tests/benchmark.py:16-66), built
    through this framework's own loaders/TMA — 57 tracing surfaces."""
    import optrace_tpu as ot

    RT = ot.Raytracer(outline=[-50, 50, -50, 50, -30, 430], no_pol=True)
    RSS = ot.presets.image.cell([100e-3, 100e-3])
    RT.add(ot.RaySource(RSS, divergence="Lambertian",
                        pos=[0, 0, -0.00000001], s=[0, 0, 1], div_angle=50))

    with ot.global_options.no_warnings():
        n_dict = {}
        for cat in ["schott.agf", "ohara.agf", "hikari.agf", "hoya.agf"]:
            n_dict |= ot.load_agf(os.path.join(RES, "materials", cat))
        G = ot.load_zmx(os.path.join(
            RES, "microscope", "Nikon_1p25NA_60x_US7889433B2_MultiConfig_v2.zmx"),
            n_dict=n_dict)

        objective = ot.Group(G.lenses[:18])
        RT.add(objective)
        tube = ot.Group(G.lenses[20:24])
        tube.move_to(G.lenses[20].pos - [0, 0, 150])
        RT.add(tube)
        eyepiece = ot.load_zmx(os.path.join(RES, "eyepiece", "UK565851-1.zmx"),
                               n_dict=n_dict)
        eyepiece.remove(eyepiece.detectors)
        RT.n0 = G.n0

        tma = ot.TMA(objective.lenses + tube.lenses, n0=G.n0)
        z_img0 = tma.image_position(-0.00000001)
        eyep_f0 = eyepiece.tma().focal_points[0]
        eyepiece.move_to([0, 0, eyepiece.lenses[0].pos[2] - (eyep_f0 - z_img0)])
        RT.add(eyepiece)

        eye = ot.presets.geometry.arizona_eye()
        exit_pupil = RT.tma().pupil_position(0.38)[1]
        entrance_pupil = eye.tma().pupil_position(eye.apertures[0].pos[2])[0]
        eye.move_to([0, 0, exit_pupil + (eye.pos[2] - entrance_pupil)])
        RT.add(eye)
    return RT


def build_synthetic():
    """Fallback: 28 spherical doublet-halves + aperture ≈ 57 surfaces with
    dispersive media and an image source, when fixtures are absent."""
    import optrace_tpu as ot

    RT = ot.Raytracer(outline=[-50, 50, -50, 50, -5, 600], no_pol=True)
    RSS = ot.presets.image.color_checker([10, 10])
    RT.add(ot.RaySource(RSS, divergence="Lambertian",
                        pos=[0, 0, 0], s=[0, 0, 1], div_angle=20))
    z = 10.0
    glasses = [ot.presets.refraction_index.BK7, ot.presets.refraction_index.F2]
    for i in range(28):
        front = ot.SphericalSurface(r=8, R=60.0 if i % 2 == 0 else 80.0)
        back = ot.SphericalSurface(r=8, R=-70.0 if i % 2 == 0 else -90.0)
        RT.add(ot.Lens(front, back, n=glasses[i % 2], de=0.5, pos=[0, 0, z]))
        z += 15.0
    RT.add(ot.Aperture(ot.RingSurface(r=9, ri=6), pos=[0, 0, z]))
    return RT


def main():
    RT = build_microscope() if os.path.isdir(RES) else build_synthetic()
    n_surfaces = len(RT.tracing_surfaces)

    N = 1_000_000
    nt = len(RT.tracing_surfaces) + 2
    RT.rays.init(RT.ray_sources, N, nt, RT.no_pol)
    fn = RT._get_trace_fn(N)

    out = fn(jax.random.PRNGKey(0))           # warmup/compile
    jax.block_until_ready(out)

    reps = 5
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(jax.random.PRNGKey(i + 1))
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    s_per_surface_per_mray = dt / n_surfaces / (N / 1e6)
    print(json.dumps({
        "metric": f"s/surface/Mrays ({n_surfaces}-surface microscope trace, no pol)",
        "value": round(s_per_surface_per_mray, 6),
        "unit": "s",
        "vs_baseline": round(BASELINE_S_PER_SURFACE_PER_MRAY / s_per_surface_per_mray, 2),
    }))


if __name__ == "__main__":
    main()
