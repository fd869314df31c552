"""Quantitative HURB validation against closed-form diffraction envelopes
(VERDICT #7; reference tests/hurb_geometry.py:10-290 +
tests/test_tracer_hurb.py:53-165).

HURB is an approximation: simulated profiles don't match wave optics
exactly, but their *widths* land at known ratios of the analytic envelopes.
The reference pins those ratios (weighted-std of simulation / theory):
≈0.95 for circular apertures (Airy envelope), ≈1.11 for slits (sinc²).
We assert the same ratios with the same deltas.
"""

import numpy as np
import pytest
import scipy.special

import optrace_tpu as ot


def _weighted_std(x, w):
    w = np.maximum(w, 0)
    mean = np.average(x, weights=w)
    return np.sqrt(np.average((x - mean) ** 2, weights=w))


def _airy(r, wl_nm, n, radius_mm, z_mm):
    q = 2 * np.pi / (wl_nm * 1e-9) * n * radius_mm / z_mm * r * 1e-3
    q = np.where(q == 0, 1e-12, q)
    return (2 * scipy.special.j1(q) / q) ** 2


def _sinc2(x, wl_nm, n, d_mm, z_mm):
    return np.sinc(d_mm * 1e-3 * n / (wl_nm * 1e-9) * x / z_mm) ** 2


def _pinhole_profile(n, ri, wl, zd, N, N_px, use_hurb=True, hurb_factor=None):
    """Collimated beam through a pinhole, far-field profile at zd
    (reference hurb_geometry.hurb_pinhole)."""
    RT = ot.Raytracer(outline=[-15, 15, -15, 15, -6, zd + 10], use_hurb=use_hurb,
                      n0=ot.RefractionIndex("Constant", n=n))
    if hurb_factor is not None:
        RT.HURB_FACTOR = hurb_factor
    RT.add(ot.RaySource(ot.CircularSurface(r=ri), s=[0, 0, 1], pos=[0, 0, -5],
                        spectrum=ot.LightSpectrum("Monochromatic", wl=wl)))
    RT.add(ot.Aperture(ot.RingSurface(r=ri + 5, ri=ri), pos=[0, 0, 0]))
    dim = 1.22 / (2 * np.pi / (wl * 1e-9) * n * ri / zd / np.pi) * 1e3 * 36
    RT.add(ot.Detector(ot.RectangularSurface(dim=[dim, dim]), pos=[0, 0, zd]))
    with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
        RT.trace(N)
        img = RT.detector_image()
    imgi = img.get("Irradiance", N_px)
    bins, p1 = imgi.profile(x=0)
    _, p2 = imgi.profile(y=0)
    prof = 0.5 * (p1[0] + p2[0])
    prof = prof / prof.max()
    r = bins[:-1] + (bins[1] - bins[0]) / 2
    return r, prof, _airy(r, wl, n, ri, zd)


def _slit_profiles(n, d1, d2, wl, zd, N, N_px, use_hurb=True, hurb_factor=None):
    """Rect beam through a slit; profiles along both axes
    (reference hurb_geometry.hurb_slit, angle=0 case)."""
    dim = 5 / (min(d1, d2) * 1e-3 * n / (wl * 1e-9) / zd) * 6
    RT = ot.Raytracer(outline=[-dim, dim, -dim, dim, -6, zd + 10], use_hurb=use_hurb,
                      n0=ot.RefractionIndex("Constant", n=n))
    if hurb_factor is not None:
        RT.HURB_FACTOR = hurb_factor
    RT.add(ot.RaySource(ot.RectangularSurface(dim=[d1, d2]), s=[0, 0, 1], pos=[0, 0, -5],
                        spectrum=ot.LightSpectrum("Monochromatic", wl=wl)))
    RT.add(ot.Aperture(ot.SlitSurface(dim=[d1 + 2, d2 + 2], dimi=[d1, d2]), pos=[0, 0, 0]))
    RT.add(ot.Detector(ot.RectangularSurface(dim=[dim, dim]), pos=[0, 0, zd]))
    with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
        RT.trace(N)
        img = RT.detector_image()
    imgi = img.get("Irradiance", N_px)
    bins, py = imgi.profile(x=0)   # profile ALONG y → spread set by d2
    _, px = imgi.profile(y=0)      # profile along x → spread set by d1
    r = bins[:-1] + (bins[1] - bins[0]) / 2
    p_x = px[0] / px[0].max()
    p_y = py[0] / py[0].max()
    return r, p_x, p_y, _sinc2(r, wl, n, d1, zd), _sinc2(r, wl, n, d2, zd)


class TestHurbQuantitative:

    def test_pinhole_airy_ratio(self):
        """σ_sim/σ_Airy ≈ 0.95 ± 0.05 for circular apertures
        (reference test_tracer_hurb.py:53-66)."""
        for n, ri, wl, zd in [(1.0, 0.03, 550.0, 100.0),
                              (1.33, 0.05, 450.0, 120.0)]:
            r, sim, theo = _pinhole_profile(n, ri, wl, zd, N=2_000_000, N_px=315)
            ratio = _weighted_std(r, sim) / _weighted_std(r, theo)
            assert ratio == pytest.approx(0.95, abs=0.05), (n, ri, wl, zd, ratio)

    def test_slit_sinc_ratio(self):
        """σ_sim/σ_sinc² ≈ 1.11 for slits, both axes independently
        (reference test_tracer_hurb.py:96-113)."""
        n, d1, d2, wl, zd = 1.0, 0.05, 0.4, 550.0, 20.0
        r, p_x, p_y, t_x, t_y = _slit_profiles(n, d1, d2, wl, zd,
                                               N=2_000_000, N_px=315)
        ratio_x = _weighted_std(r, p_x) / _weighted_std(r, t_x)
        ratio_y = _weighted_std(r, p_y) / _weighted_std(r, t_y)
        assert ratio_x == pytest.approx(1.11, abs=0.08), ratio_x
        assert ratio_y == pytest.approx(1.11, abs=0.12), ratio_y

    def test_hurb_factor_scales_width(self):
        """Doubling HURB_FACTOR doubles the diffraction spread
        (reference test_tracer_hurb.py:149-165)."""
        n, ri, wl, zd = 1.0, 0.03, 550.0, 100.0
        r1, sim1, _ = _pinhole_profile(n, ri, wl, zd, N=500_000, N_px=189)
        r2, sim2, _ = _pinhole_profile(n, ri, wl, zd, N=500_000, N_px=189,
                                       hurb_factor=2 * np.sqrt(2.0))
        s1 = _weighted_std(r1, sim1)
        s2 = _weighted_std(r2, sim2)
        assert s2 / s1 == pytest.approx(2.0, abs=0.3)

    def test_no_hurb_no_spread(self):
        """With use_hurb=False the collimated beam stays geometric: all
        power inside the aperture radius (reference :132-140)."""
        n, ri, wl, zd = 1.0, 0.03, 550.0, 100.0
        RT = ot.Raytracer(outline=[-15, 15, -15, 15, -6, zd + 10], use_hurb=False,
                          n0=ot.RefractionIndex("Constant", n=n))
        RT.add(ot.RaySource(ot.CircularSurface(r=ri), s=[0, 0, 1], pos=[0, 0, -5],
                            spectrum=ot.LightSpectrum("Monochromatic", wl=wl)))
        RT.add(ot.Aperture(ot.RingSurface(r=ri + 5, ri=ri), pos=[0, 0, 0]))
        RT.add(ot.Detector(ot.RectangularSurface(dim=[2, 2]), pos=[0, 0, zd]))
        with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
            RT.trace(100_000)
            img = RT.detector_image()
        ph_r = np.hypot(*np.meshgrid(
            np.linspace(img.extent[0], img.extent[1], img.shape[1]),
            np.linspace(img.extent[2], img.extent[3], img.shape[0])))
        w = img.data[:, :, 3]
        assert w[ph_r > ri * 1.05].sum() < 1e-9 * w.sum() + 1e-12
