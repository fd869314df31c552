"""End-to-end parity vs the NumPy reference: same geometry traced in both
frameworks must produce statistically identical detector images and focus
positions (BASELINE.json: "images and pixel gradients allclose vs the
NumPy reference" — allclose here is statistical, both are Monte-Carlo).
"""

import numpy as np
import pytest

import optrace_tpu as ot
from tests.reference_oracle import get_reference

otr = get_reference()
needs_oracle = pytest.mark.skipif(otr is None, reason="reference unavailable")


def _norm_img(arr):
    s = arr.sum()
    return arr / s if s > 0 else arr


@needs_oracle
class TestTraceParity:

    def _spherical_pair(self, N=200000):
        """identical biconvex-lens scenes in both frameworks"""
        import optrace as ref

        RT = ot.Raytracer(outline=[-5, 5, -5, 5, -10, 40], no_pol=True)
        RT.add(ot.RaySource(ot.CircularSurface(r=1.0), pos=[0, 0, -5], divergence="None",
                            spectrum=ot.LightSpectrum("Monochromatic", wl=550)))
        n = ot.RefractionIndex("Constant", n=1.5)
        RT.add(ot.Lens(ot.SphericalSurface(r=3, R=15), ot.SphericalSurface(r=3, R=-15),
                       n=n, pos=[0, 0, 0], d=1.0))
        RT.add(ot.Detector(ot.RectangularSurface(dim=[3, 3]), pos=[0, 0, 18]))

        RTr = ref.Raytracer(outline=[-5, 5, -5, 5, -10, 40], no_pol=True)
        RTr.add(ref.RaySource(ref.CircularSurface(r=1.0), pos=[0, 0, -5], divergence="None",
                              spectrum=ref.LightSpectrum("Monochromatic", wl=550)))
        nr = ref.RefractionIndex("Constant", n=1.5)
        RTr.add(ref.Lens(ref.SphericalSurface(r=3, R=15), ref.SphericalSurface(r=3, R=-15),
                         n=nr, pos=[0, 0, 0], d=1.0))
        RTr.add(ref.Detector(ref.RectangularSurface(dim=[3, 3]), pos=[0, 0, 18]))

        with ot.global_options.no_warnings():
            RT.trace(N)
        with ref.global_options.no_warnings(), ref.global_options.no_progress_bar():
            RTr.trace(N)
        return RT, RTr

    def test_spherical_aberration_image(self):
        """irradiance profiles of the aberrated spot agree"""
        RT, RTr = self._spherical_pair()
        ext = [-1.0, 1.0, -1.0, 1.0]
        img = RT.detector_image(extent=ext).get("Irradiance", 45)
        img_r = RTr.detector_image(extent=ext).get("Irradiance", 45)

        a = _norm_img(img.data)
        b = _norm_img(np.asarray(img_r.data))
        # Monte-Carlo noise at 45x45 px / 2e5 rays: compare smoothed images
        assert a.shape == b.shape
        # total power on detector within extent matches
        assert img.data.sum() == pytest.approx(float(np.asarray(img_r.data).sum()), rel=2e-3)
        # normalized spatial distributions agree to a few percent of peak
        diff = np.abs(a - b).max() / b.max()
        assert diff < 0.08

    def test_focus_positions_agree(self):
        RT, RTr = self._spherical_pair(N=100000)
        res, _ = RT.focus_search("RMS Spot Size", z_start=8)
        with ref_noprogress(RTr):
            res_r, _ = RTr.focus_search("RMS Spot Size", z_start=8)
        assert res.x == pytest.approx(float(res_r.x), abs=0.02)

    def test_fresnel_power_agrees(self):
        RT, RTr = self._spherical_pair(N=50000)
        w_mine = RT.rays.w_list[:, 2].sum() / RT.rays.w_list[:, 0].sum()
        w_ref = RTr.rays.w_list[:, 2].sum() / RTr.rays.w_list[:, 0].sum()
        assert w_mine == pytest.approx(float(w_ref), rel=1e-3)

    def test_dispersive_spectrum_parity(self):
        """chromatic focal shift through a BK7 lens matches"""
        import optrace as ref

        coeff = [1.03961212, 0.00600069867, 0.231792344, 0.0200179144, 1.01046945, 103.560653]

        def build(m, RTc, RSc, Lc, SSc, CSc, RIc, LSc):
            RT = RTc(outline=[-5, 5, -5, 5, -10, 40], no_pol=True)
            RT.add(RSc(CSc(r=1.0), pos=[0, 0, -5], divergence="None",
                       spectrum=LSc("Lines", lines=[486.1327, 656.272], line_vals=[1., 1.])))
            RT.add(Lc(SSc(r=3, R=15), SSc(r=3, R=-15),
                      n=RIc("Sellmeier1", coeff=list(coeff)), pos=[0, 0, 0], d=1.0))
            return RT

        RT = build("mine", ot.Raytracer, ot.RaySource, ot.Lens, ot.SphericalSurface,
                   ot.CircularSurface, ot.RefractionIndex, ot.LightSpectrum)
        RTr = build("ref", ref.Raytracer, ref.RaySource, ref.Lens, ref.SphericalSurface,
                    ref.CircularSurface, ref.RefractionIndex, ref.LightSpectrum)

        with ot.global_options.no_warnings():
            RT.trace(100000)
        with ref.global_options.no_warnings(), ref.global_options.no_progress_bar():
            RTr.trace(100000)

        # spot spread on a fixed plane reflects chromatic aberration equally
        for z in [13.0, 14.0]:
            res, _ = RT.focus_search("RMS Spot Size", z_start=z)
            with ref_noprogress(RTr):
                res_r, _ = RTr.focus_search("RMS Spot Size", z_start=z)
            assert res.fun == pytest.approx(float(res_r.fun), rel=0.05)


class ref_noprogress:
    def __init__(self, RTr):
        self.RTr = RTr

    def __enter__(self):
        import optrace as ref
        self._c1 = ref.global_options.no_progress_bar()
        self._c2 = ref.global_options.no_warnings()
        self._c1.__enter__()
        self._c2.__enter__()

    def __exit__(self, *a):
        self._c2.__exit__(*a)
        self._c1.__exit__(*a)
        return False
