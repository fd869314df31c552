"""On-chip A/B parity of the whole-run Pallas kernel vs the XLA scan for
the kernel-only surface kinds (even aspheres, tilted planes) — compiled
Mosaic behavior, which interpret-mode tests cannot cover. Run ON THE TPU
HOST:

    python tools/check_kernel_parity_tpu.py

Prints one JSON line per scene; `ok: true` everywhere is the pass
signal. (The sharded-kernel parity has its own runner,
tools/check_sharded_kernel.py, and runs inside bench.py.)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np


def _scene(kind: str, no_pol: bool):
    import optrace_tpu as ot

    RT = ot.Raytracer(outline=[-10, 10, -10, 10, -10, 80], no_pol=no_pol)
    RT.add(ot.RaySource(ot.CircularSurface(r=1.5), divergence="Lambertian",
                        div_angle=8, pos=[0, 0, -5],
                        spectrum=ot.presets.light_spectrum.d65))
    n1 = ot.presets.refraction_index.BK7
    n2 = ot.presets.refraction_index.F2
    RT.add(ot.Lens(ot.SphericalSurface(r=3, R=20),
                   ot.SphericalSurface(r=3, R=-25),
                   n=n1, pos=[0, 0, 0], d=1.0))
    if kind == "asphere":
        RT.add(ot.Lens(ot.AsphericSurface(r=3, R=30, k=-0.5,
                                          coeff=[2e-4, -1e-6]),
                       ot.CircularSurface(r=3), n=n2, pos=[0, 0, 5], d=0.8))
    else:
        th = np.radians(8.0)
        RT.add(ot.Lens(ot.TiltedSurface(r=3, normal=[0.0, float(np.sin(th)),
                                                     float(np.cos(th))]),
                       ot.TiltedSurface(r=3, normal=[0.0, 0.0, 1.0]),
                       n=n2, pos=[0, 0, 5], d=1.5))
    RT.add(ot.Lens(ot.SphericalSurface(r=3, R=15),
                   ot.SphericalSurface(r=3, R=-15),
                   n=n1, pos=[0, 0, 10], d=1.2))
    return RT


def check(kind: str, no_pol: bool, N: int = 50000) -> dict:
    import optrace_tpu as ot

    with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
        ot.global_options.pallas_trace = False
        A = _scene(kind, no_pol)
        A.trace(N)
        ot.global_options.pallas_trace = True
        ot.global_options.pallas_fuse_planar = True    # tilted is opt-in
        try:
            B = _scene(kind, no_pol)
            B.trace(N)
        finally:
            ot.global_options.pallas_fuse_planar = False
            ot.global_options.pallas_trace = False
    dp = float(np.abs(np.asarray(A.rays.p_list)
                      - np.asarray(B.rays.p_list)).max())
    dw = float(np.abs(np.asarray(A.rays.w_list)
                      - np.asarray(B.rays.w_list)).max())
    msgs_eq = bool((A._msgs == B._msgs).all())
    return {"scene": kind, "no_pol": no_pol, "maxdiff_p": round(dp, 8),
            "maxdiff_w": dw, "infos_equal": msgs_eq,
            "ok": bool(dp < 5e-4 and dw < 1e-6 and msgs_eq)}


if __name__ == "__main__":
    import jax
    if jax.default_backend() == "cpu":
        print(json.dumps({"skipped": "needs the TPU backend"}))
        sys.exit(0)
    ok = True
    for kind in ("asphere", "tilted"):
        for no_pol in (True, False):
            r = check(kind, no_pol)
            ok = ok and r["ok"]
            print(json.dumps(r), flush=True)
    sys.exit(0 if ok else 1)
