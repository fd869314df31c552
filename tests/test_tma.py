"""TMA paraxial analysis tests: analytic oracles + reference comparison."""

import numpy as np
import pytest

import optrace_tpu as ot
from optrace_tpu.analysis import TMA
from tests.reference_oracle import get_reference

ot_ref = get_reference()
needs_oracle = pytest.mark.skipif(ot_ref is None, reason="reference unavailable")


def biconvex(R=20.0, d=1.0, n_val=1.5):
    n = ot.RefractionIndex("Constant", n=n_val)
    return ot.Lens(ot.SphericalSurface(r=3, R=R), ot.SphericalSurface(r=3, R=-R),
                   n=n, pos=[0, 0, 0], d=d)


class TestTMA:

    def test_lensmaker(self):
        L = biconvex()
        tma = TMA([L])
        f_expect = 1 / ((1.5 - 1) * (1 / 20 - 1 / -20 + (1.5 - 1) * 1.0 / (1.5 * 20 * -20)))
        assert tma.efl == pytest.approx(f_expect, rel=1e-9)
        assert tma.powers[1] == pytest.approx(1000 / f_expect, rel=1e-9)

    def test_ideal_lens(self):
        L = ot.IdealLens(r=3, D=25, pos=[0, 0, 5])
        tma = TMA([L])
        assert tma.efl == pytest.approx(40.0, rel=1e-9)
        assert tma.focal_points[1] == pytest.approx(45.0, rel=1e-9)

    def test_imaging_equation(self):
        L = ot.IdealLens(r=3, D=50, pos=[0, 0, 0])   # f=20
        tma = TMA([L])
        # 1/20 = 1/40 + 1/b -> b = 40
        assert tma.image_position(-40) == pytest.approx(40.0, rel=1e-6)
        assert tma.image_magnification(-40) == pytest.approx(-1.0, rel=1e-6)

    def test_object_position_inverse(self):
        L = biconvex()
        tma = TMA([L])
        z_b = tma.image_position(-50)
        assert tma.object_position(z_b) == pytest.approx(-50, rel=1e-6)

    def test_symmetric_lens_principal_points(self):
        L = biconvex()
        tma = TMA([L])
        p1, p2 = tma.principal_points
        # symmetric biconvex: principal points symmetric around center
        assert p1 + p2 == pytest.approx(0.0, abs=1e-9)

    def test_two_lens_system(self):
        # two thin ideal lenses f1=f2=40mm separated by 20mm:
        # 1/f = 1/f1 + 1/f2 - d/(f1 f2) -> f = 26.67
        L1 = ot.IdealLens(r=3, D=25, pos=[0, 0, 0])
        L2 = ot.IdealLens(r=3, D=25, pos=[0, 0, 20])
        tma = TMA([L1, L2])
        f_expect = 1 / (1 / 40 + 1 / 40 - 20 / 1600)
        assert tma.efl == pytest.approx(f_expect, rel=1e-9)

    def test_ambient_media(self):
        # lens with n2 behind: powers_n symmetric
        n = ot.RefractionIndex("Constant", n=1.5)
        n2 = ot.RefractionIndex("Constant", n=1.33)
        L = ot.Lens(ot.SphericalSurface(r=3, R=20), ot.SphericalSurface(r=3, R=-20),
                    n=n, n2=n2, pos=[0, 0, 0], d=1.0)
        tma = TMA([L])
        assert tma.n2 == pytest.approx(1.33)
        assert tma.powers_n[0] == pytest.approx(-tma.powers_n[1], rel=1e-9)

    def test_group_tma(self):
        RT = ot.Raytracer(outline=[-5, 5, -5, 5, -10, 60])
        RT.add(ot.RaySource(ot.Point(), pos=[0, 0, -5],
                            spectrum=ot.LightSpectrum("Monochromatic", wl=550)))
        RT.add(biconvex())
        tma = RT.tma()
        assert np.isfinite(tma.efl)

    def test_negative_distance_raises(self):
        L1 = biconvex()
        L2 = biconvex()
        L2.move_to([0, 0, 0.2])   # overlapping
        with pytest.raises(RuntimeError):
            TMA([L1, L2])

    @needs_oracle
    def test_oracle_double_gauss(self):
        import optrace as otr
        from optrace_tpu.presets.geometry import double_gauss

        # build the same objective in the reference
        def build_ref():
            G = []
            n_list = [(1.797, 45.3), (1.773, 49.4), (1.673, 32.2), (1.740, 28.3),
                      (1.773, 49.4), (1.788, 47.5), (1.788, 47.5)]
            specs = [(38.0, 78.36, 38.0, 469.5, 0, 9.8837, 0.1938),
                     (32.0, 50.3, 31.0, 74.38, None, 9.1085, 2.9457),
                     (29.5, 138.1, 25.5, 34.33, None, 2.3256, 16.07 + 13),
                     (24.4, -34.41, 28.5, -2907.0, None, 1.938, 1e-6),
                     (28.5, -2907.0, 30.0, -59.05, None, 12.403, 0.3876),
                     (33.4, -150.9, 33.9, -57.89, None, 8.333, 0.1938),
                     (33.0, 284.6, 33.0, -253.2, None, 5.0388, None)]
            z = 0.0
            lenses = []
            for (r1, R1, r2, R2, _, d2, gap), (nv, V) in zip(specs, n_list):
                n = otr.RefractionIndex("Abbe", n=nv, V=V)
                L = otr.Lens(otr.SphericalSurface(r=r1, R=R1), otr.SphericalSurface(r=r2, R=R2),
                             n=n, pos=[0, 0, z], d1=0, d2=d2)
                lenses.append(L)
                z = L.back.pos[2] + (gap if gap is not None else 0)
            return lenses

        ref_tma = otr.TMA(build_ref())
        G = double_gauss(with_detector=False)
        my_tma = TMA(G.lenses)
        assert my_tma.efl == pytest.approx(float(ref_tma.efl), rel=1e-6)
        assert my_tma.bfl == pytest.approx(float(ref_tma.bfl), rel=1e-6)
        assert my_tma.principal_points[1] == pytest.approx(float(ref_tma.principal_points[1]), rel=1e-6)

    def test_trace_focus_matches_tma(self):
        """focus search on traced rays must land at the TMA focal point"""
        RT = ot.Raytracer(outline=[-5, 5, -5, 5, -10, 60])
        RT.add(ot.RaySource(ot.CircularSurface(r=0.3), pos=[0, 0, -5], divergence="None",
                            spectrum=ot.LightSpectrum("Monochromatic", wl=555)))
        L = biconvex()
        RT.add(L)
        RT.trace(20000)
        res, _ = RT.focus_search("RMS Spot Size", z_start=10)
        tma = TMA([L])
        assert res.x == pytest.approx(tma.focal_points[1], abs=0.05)
