"""Long-system f32 accuracy validation (VERDICT #2).

The TPU path traces in f32; the reference stores f64 because optical path
lengths accumulate (reference ray_storage.py:77-83). These tests quantify
the f32 error against an f64 oracle — the same scene compiled with f64
parameters under ``jax.enable_x64`` and fed the identical ray bundle — and
pin the budget: transverse position error at the image plane must stay far
below one detector pixel (945 px over a mm-scale extent ≈ 1 µm).

Measured on the real 57-surface microscope benchmark workload
(tools/accuracy_probe.py, N=20k): median |Δxy| 1.3e-5 mm, p99 5.3e-5 mm at
the retina — ~20× below a pixel. Both legs run eagerly: jit-vs-eager only
changes fusion rounding, and op-by-op is the *upper bound* (fused fma is
more accurate), so the budget holds a fortiori for the jitted TPU path.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import optrace_tpu as ot
from optrace_tpu.tracer.trace_core import trace_bundle


def _trace_both(RT, N, seed=0):
    """Trace the same f64-generated bundle through the f32 and f64 scene
    compilations; returns (p64, w64, p32, w32) stacked per section."""
    nt = len(RT.tracing_surfaces) + 2
    RT.rays.init(RT.ray_sources, N, nt, RT.no_pol, seed=seed)
    outline = tuple(float(v) for v in RT.outline)

    with jax.enable_x64():
        gen = RT._make_source_fn(N)
        p, s, pols, w, wl = [np.asarray(a, dtype=np.float64)
                             for a in gen(jax.random.PRNGKey(seed))]
        out64 = trace_bundle(RT._build_steps(np.float64), RT.n0, outline,
                             jnp.asarray(p), jnp.asarray(s), jnp.asarray(pols),
                             jnp.asarray(w), jnp.asarray(wl),
                             RT.no_pol, RT.use_hurb, key=jax.random.PRNGKey(1))
        p64, w64 = np.asarray(out64["p"]), np.asarray(out64["w"])

    out32 = trace_bundle(RT._build_steps(np.float32), RT.n0, outline,
                         jnp.asarray(p, jnp.float32), jnp.asarray(s, jnp.float32),
                         jnp.asarray(pols, jnp.float32), jnp.asarray(w, jnp.float32),
                         jnp.asarray(wl, jnp.float32),
                         RT.no_pol, RT.use_hurb, key=jax.random.PRNGKey(1))
    p32 = np.asarray(out32["p"], dtype=np.float64)
    w32 = np.asarray(out32["w"], dtype=np.float64)
    return p64, w64, p32, w32


def _final_errors(p64, w64, p32, w32):
    alive = (w64 > 0) & (w32 > 0)
    nt = p64.shape[1]
    last = max(j for j in range(nt) if alive[:, j].any())
    m = alive[:, last]
    d = p32[m, last] - p64[m, last]
    dxy = np.hypot(d[:, 0], d[:, 1])
    disagree = int(((w64[:, last] > 0) != (w32[:, last] > 0)).sum())
    return dxy, disagree, int(m.sum())


class TestF32ErrorBudget:

    def test_long_stack_error_budget(self):
        """5 dispersive doublet-halves over a 400 mm track: f32 transverse
        error at the image plane stays below 1/10 detector pixel."""
        RT = ot.Raytracer(outline=[-20, 20, -20, 20, -10, 400], no_pol=True)
        RT.add(ot.RaySource(ot.CircularSurface(r=2), pos=[0, 0, 0],
                            divergence="Lambertian", div_angle=10,
                            spectrum=ot.presets.light_spectrum.d65))
        glasses = [ot.presets.refraction_index.BK7, ot.presets.refraction_index.F2]
        z = 30.0
        for i in range(5):
            RT.add(ot.Lens(ot.SphericalSurface(r=8, R=60 + 10 * i),
                           ot.SphericalSurface(r=8, R=-(70 + 10 * i)),
                           n=glasses[i % 2], de=1.0, pos=[0, 0, z]))
            z += 70.0
        RT.add(ot.Detector(ot.RectangularSurface(dim=[20, 20]), pos=[0, 0, 390]))

        p64, w64, p32, w32 = _trace_both(RT, 3000)
        dxy, disagree, n_alive = _final_errors(p64, w64, p32, w32)
        assert n_alive > 500
        # pixel at 945 px over the ~20 mm image ≈ 21 µm; budget ≤ 1/10 px
        assert np.median(dxy) < 5e-4
        assert np.percentile(dxy, 99) < 2e-3
        assert disagree < 0.01 * n_alive

    @pytest.mark.slow
    @pytest.mark.oracle
    def test_microscope_f32_error_budget(self):
        """The real benchmark workload: 57-surface Nikon microscope + eye.
        f32 retina-plane error must stay ≥10× below one 945-px pixel."""
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import bench
        if not os.path.isdir(bench.RES):
            pytest.skip("reference zmx fixtures not mounted")
        with ot.global_options.no_warnings():
            RT = bench.build_microscope()
        p64, w64, p32, w32 = _trace_both(RT, 20000)
        dxy, disagree, n_alive = _final_errors(p64, w64, p32, w32)
        assert n_alive > 30
        # retina image extent ~0.5 mm → pixel ≈ 0.5 µm; measured p99 ≈ 0.05 µm
        assert np.median(dxy) < 5e-5
        assert np.percentile(dxy, 99) < 2e-4
        assert disagree <= max(1, 0.05 * n_alive)

    @pytest.mark.slow
    @pytest.mark.oracle
    def test_microscope_image_parity_vs_reference(self):
        """Build the SAME microscope in this framework and in the reference
        package (each through its own zmx/agf loaders and TMA positioning),
        trace, and compare the retina-plane spot distribution
        (reference tests/benchmark.py:16-66 geometry)."""
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import bench
        from reference_oracle import get_reference
        otr = get_reference()
        if otr is None or not os.path.isdir(bench.RES):
            pytest.skip("reference package or fixtures unavailable")

        with ot.global_options.no_warnings():
            RT = bench.build_microscope()

        # same geometry via the reference's own API
        res = bench.RES
        with otr.global_options.no_warnings(), otr.global_options.no_progress_bar():
            RTr = otr.Raytracer(outline=[-50, 50, -50, 50, -30, 430], no_pol=True)
            # SAME pixel data on both sides (pure optics parity — the two
            # packages ship different cell imagery, and the spot centroid
            # depends on the image's brightness distribution)
            cell_data = np.asarray(
                ot.presets.image.cell([100e-3, 100e-3]).data, dtype=np.float64)
            RSS = otr.RGBImage(cell_data.copy(), [100e-3, 100e-3])
            RTr.add(otr.RaySource(RSS, divergence="Lambertian",
                                  pos=[0, 0, -0.00000001], s=[0, 0, 1], div_angle=50))
            n_dict = {}
            for cat in ["schott.agf", "ohara.agf", "hikari.agf", "hoya.agf"]:
                n_dict |= otr.load_agf(os.path.join(res, "materials", cat))
            G = otr.load_zmx(os.path.join(
                res, "microscope", "Nikon_1p25NA_60x_US7889433B2_MultiConfig_v2.zmx"),
                n_dict=n_dict)
            objective = otr.Group(G.lenses[:18])
            RTr.add(objective)
            tube = otr.Group(G.lenses[20:24])
            tube.move_to(G.lenses[20].pos - [0, 0, 150])
            RTr.add(tube)
            eyepiece = otr.load_zmx(os.path.join(res, "eyepiece", "UK565851-1.zmx"),
                                    n_dict=n_dict)
            eyepiece.remove(eyepiece.detectors)
            RTr.n0 = G.n0
            tma = otr.TMA(objective.lenses + tube.lenses, n0=G.n0)
            z_img0 = tma.image_position(-0.00000001)
            eyep_f0 = eyepiece.tma().focal_points[0]
            eyepiece.move_to([0, 0, eyepiece.lenses[0].pos[2] - (eyep_f0 - z_img0)])
            RTr.add(eyepiece)
            eye = otr.presets.geometry.arizona_eye()
            exit_pupil = RTr.tma().pupil_position(0.38)[1]
            entrance_pupil = eye.tma().pupil_position(eye.apertures[0].pos[2])[0]
            eye.move_to([0, 0, exit_pupil + (eye.pos[2] - entrance_pupil)])
            RTr.add(eye)

        # positioning parity: every tracing surface at the same z. The
        # eyepiece/eye groups are placed via TMA image/pupil positions;
        # small implementation differences there (glass Abbe estimates)
        # shift them by ≤5 µm — optically negligible vs the ~25 mm
        # eyepiece focal length, so 0.01 mm is the parity criterion.
        z_ours = np.array([s.pos[2] for s in RT.tracing_surfaces])
        z_ref = np.array([s.pos[2] for s in RTr.tracing_surfaces])
        assert z_ours.shape == z_ref.shape
        np.testing.assert_allclose(z_ours, z_ref, atol=0.01)

        # trace both, compare the weighted spot distribution at the last
        # illuminated section (the retina region)
        N = 200000
        with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
            RT.trace(N)
        with otr.global_options.no_warnings(), otr.global_options.no_progress_bar():
            RTr.trace(N)

        def spot(p_list, w_list):
            w = w_list[:, -2]
            m = w > 0
            p = p_list[m, -2, :2]
            w = w[m]
            mean = np.average(p, axis=0, weights=w)
            rms = np.sqrt(np.average(np.sum((p - mean) ** 2, axis=1), weights=w))
            return m.sum() / p_list.shape[0], mean, rms, w.sum() / N

        frac1, mean1, rms1, pw1 = spot(RT.rays.p_list, RT.rays.w_list)
        frac2, mean2, rms2, pw2 = spot(np.asarray(RTr.rays.p_list),
                                       np.asarray(RTr.rays.w_list))
        # MC noise between different RNGs; distribution-level agreement
        assert abs(frac1 - frac2) < 0.1 * max(frac1, frac2)
        assert np.all(np.abs(mean1 - mean2) < 0.02)
        assert abs(rms1 - rms2) < 0.05 * max(rms1, rms2)
        assert abs(pw1 - pw2) < 0.1 * max(pw1, pw2)
