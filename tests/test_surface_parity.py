"""Per-surface-type geometry parity vs the reference implementation
(reference tests/test_surface.py scope: values, normals, masks, z-bounds,
hit finding)."""

import numpy as np
import pytest

import optrace_tpu as ot
from tests.reference_oracle import get_reference

otr = get_reference()
needs_oracle = pytest.mark.skipif(otr is None, reason="reference unavailable")

NORMAL = [0, 0.2, float(np.sqrt(1 - 0.04))]


def _pairs():
    """(ours, reference, sample_radius) triples of equivalent surfaces."""
    def poly(x, y):
        return 0.02 * x * x - 0.013 * y * y + 0.004 * x * y

    return [
        (ot.CircularSurface(r=2), otr.CircularSurface(r=2), 2.0),
        (ot.RingSurface(r=2, ri=0.5), otr.RingSurface(r=2, ri=0.5), 2.0),
        (ot.RectangularSurface(dim=[2, 3]), otr.RectangularSurface(dim=[2, 3]), 1.0),
        (ot.SlitSurface(dim=[2, 3], dimi=[0.5, 0.2]),
         otr.SlitSurface(dim=[2, 3], dimi=[0.5, 0.2]), 1.0),
        (ot.ConicSurface(r=3, R=12, k=-0.7), otr.ConicSurface(r=3, R=12, k=-0.7), 3.0),
        (ot.SphericalSurface(r=3, R=-15), otr.SphericalSurface(r=3, R=-15), 3.0),
        (ot.AsphericSurface(r=2, R=10, k=-1, coeff=[1e-4, -2e-6]),
         otr.AsphericSurface(r=2, R=10, k=-1, coeff=[1e-4, -2e-6]), 2.0),
        (ot.TiltedSurface(r=2, normal=list(NORMAL)),
         otr.TiltedSurface(r=2, normal=list(NORMAL)), 2.0),
        (ot.FunctionSurface2D(r=2, func=poly), otr.FunctionSurface2D(r=2, func=poly), 2.0),
    ]


@needs_oracle
class TestSurfaceParity:

    def test_values(self):
        rng = np.random.default_rng(0)
        for s, sr, rad in _pairs():
            x = rng.uniform(-rad * 0.7, rad * 0.7, 500)
            y = rng.uniform(-rad * 0.7, rad * 0.7, 500)
            np.testing.assert_allclose(
                np.asarray(s.values(x, y), dtype=np.float64),
                sr.values(x, y), atol=2e-6, err_msg=type(s).__name__)

    def test_normals(self):
        rng = np.random.default_rng(1)
        for s, sr, rad in _pairs():
            x = rng.uniform(-rad * 0.6, rad * 0.6, 300)
            y = rng.uniform(-rad * 0.6, rad * 0.6, 300)
            ours = np.asarray(s.normals(x, y), dtype=np.float64)
            if type(s).__name__ == "FunctionSurface2D":
                # ours are jvp-exact; the reference estimates by finite
                # differences, so the analytic check is tight and the
                # cross-framework one only at the reference's step noise
                gx = 0.04 * x + 0.004 * y
                gy = -0.026 * y + 0.004 * x
                n = np.column_stack([-gx, -gy, np.ones_like(gx)])
                n /= np.linalg.norm(n, axis=1, keepdims=True)
                np.testing.assert_allclose(ours, n, atol=5e-6)
                np.testing.assert_allclose(ours, sr.normals(x, y), atol=1e-3)
            else:
                np.testing.assert_allclose(ours, sr.normals(x, y), atol=5e-6,
                                           err_msg=type(s).__name__)

    def test_masks(self):
        xs = np.linspace(-3.2, 3.2, 41)
        X, Y = map(np.ravel, np.meshgrid(xs, xs))
        for s, sr, _ in _pairs():
            np.testing.assert_array_equal(
                np.asarray(s.mask(X, Y)), sr.mask(X, Y),
                err_msg=type(s).__name__)

    def test_z_bounds(self):
        for s, sr, _ in _pairs():
            assert s.z_min == pytest.approx(sr.z_min, abs=1e-6), type(s).__name__
            assert s.z_max == pytest.approx(sr.z_max, abs=1e-6), type(s).__name__

    def test_extent(self):
        for s, sr, _ in _pairs():
            np.testing.assert_allclose(np.asarray(s.extent),
                                       np.asarray(sr.extent), atol=1e-6,
                                       err_msg=type(s).__name__)

    def test_find_hit(self):
        """random oblique rays hit curved surfaces at the same points"""
        rng = np.random.default_rng(2)
        N = 2000
        p = np.column_stack([rng.uniform(-1.5, 1.5, (N, 2)),
                             np.full(N, -5.0)])
        sdir = np.column_stack([rng.normal(0, 0.05, (N, 2)), np.ones(N)])
        sdir /= np.linalg.norm(sdir, axis=1, keepdims=True)
        for s, sr, _ in _pairs():
            if type(s).__name__ in ("SlitSurface",):
                continue
            ph, is_hit, _ = s.find_hit(p.copy(), sdir.copy())
            phr, is_hitr, _ = sr.find_hit(p.copy(), sdir.copy())
            np.testing.assert_array_equal(np.asarray(is_hit), is_hitr,
                                          err_msg=type(s).__name__)
            both = np.asarray(is_hit) & is_hitr
            np.testing.assert_allclose(np.asarray(ph)[both], phr[both],
                                       atol=5e-6, err_msg=type(s).__name__)

    def test_edge(self):
        for s, sr, _ in _pairs():
            ex, ey, ez = [np.asarray(v, dtype=np.float64) for v in s.edge(73)]
            exr, eyr, ezr = sr.edge(73)
            np.testing.assert_allclose(ex, exr, atol=1e-6, err_msg=type(s).__name__)
            np.testing.assert_allclose(ey, eyr, atol=1e-6, err_msg=type(s).__name__)
            np.testing.assert_allclose(ez, ezr, atol=2e-6, err_msg=type(s).__name__)
