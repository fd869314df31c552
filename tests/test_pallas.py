"""Pallas kernel probes (VERDICT r2 #9): parity of the MXU one-hot binning
kernel with the XLA scatter path, standalone and through the fused render
flag. On CPU the kernel runs in Pallas interpreter mode."""

import numpy as np
import jax
import pytest

import optrace_tpu as ot
from optrace_tpu.ops.binning import bin_xyzw
from optrace_tpu.ops.pallas_binning import bin_xyzw_pallas


class TestPallasBinning:

    def _data(self, N, seed=0):
        rng = np.random.default_rng(seed)
        return (rng.uniform(-1.2, 1.2, N).astype(np.float32),
                rng.uniform(-1.2, 1.2, N).astype(np.float32),
                rng.uniform(0, 1, N).astype(np.float32),
                rng.uniform(380, 780, N).astype(np.float32))

    def test_matches_scatter(self):
        px, py, w, wl = self._data(5000)
        ext = (-1.0, 1.0, -1.0, 1.0)
        a = np.asarray(bin_xyzw(px, py, w, wl, 63, 57, ext))
        b = np.asarray(bin_xyzw_pallas(px, py, w, wl, 63, 57, ext))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_non_multiple_sizes(self):
        """ray count and bin count both far from the CHUNK/BIN_TILE grid"""
        px, py, w, wl = self._data(777, seed=2)
        ext = (-1.0, 1.0, -1.0, 1.0)
        a = np.asarray(bin_xyzw(px, py, w, wl, 31, 29, ext))
        b = np.asarray(bin_xyzw_pallas(px, py, w, wl, 31, 29, ext))
        np.testing.assert_allclose(a, b, atol=1e-5)
        assert b.shape == (29, 31, 4)

    def test_edge_inclusive(self):
        """positive edges are inclusive, like the scatter path"""
        px = np.array([1.0, -1.0, 0.0], dtype=np.float32)
        py = np.array([1.0, -1.0, 1.0], dtype=np.float32)
        w = np.ones(3, dtype=np.float32)
        wl = np.full(3, 550.0, dtype=np.float32)
        ext = (-1.0, 1.0, -1.0, 1.0)
        a = np.asarray(bin_xyzw(px, py, w, wl, 63, 57, ext))
        b = np.asarray(bin_xyzw_pallas(px, py, w, wl, 63, 57, ext))
        np.testing.assert_allclose(a, b, atol=1e-6)
        assert b[..., 3].sum() == pytest.approx(3.0)

    def test_trace_step_matches_xla(self):
        """the fused conic hit+refract kernel reproduces the XLA
        composition bit-for-bit up to reassociation noise"""
        from optrace_tpu.ops.pallas_trace import (conic_step_pallas,
                                                  conic_step_xla)
        rng = np.random.default_rng(1)
        N = 3000
        p = np.column_stack([rng.uniform(-2, 2, (N, 2)),
                             np.full(N, -5.0)]).astype(np.float32)
        s = rng.normal(0, 0.05, (N, 3)).astype(np.float32)
        s[:, 2] = 1.0
        s /= np.linalg.norm(s, axis=1, keepdims=True)
        w = rng.uniform(0.5, 1, N).astype(np.float32)
        w[:50] = 0.0
        n1 = np.full(N, 1.0, np.float32)
        n2 = np.full(N, 1.52, np.float32)
        kw = dict(rho=1 / 20.0, k=-0.5, z_min_rel=0.0, z_max_rel=0.3,
                  r_ap=3.0)
        a = conic_step_xla(p, s, w, n1, n2, **kw)
        b = conic_step_pallas(p, s, w, n1, n2, interpret=True, **kw)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-6)
        # dead rays stay dead, refracted rays lost Fresnel power
        assert np.all(np.asarray(b[2])[:50] == 0)
        assert np.asarray(b[2])[50:].max() < 1.0

    def test_fused_render_flag(self):
        """the global_options.pallas_binning flag swaps the fused render's
        sink without changing the image"""
        from optrace_tpu.parallel.render import make_fused_render

        RT = ot.Raytracer(outline=[-5, 5, -5, 5, -5, 40])
        RT.add(ot.RaySource(ot.CircularSurface(r=1), pos=[0, 0, 0],
                            divergence="Lambertian", div_angle=5,
                            spectrum=ot.presets.light_spectrum.d65))
        RT.add(ot.Lens(ot.SphericalSurface(r=3, R=20),
                       ot.SphericalSurface(r=3, R=-20),
                       n=ot.presets.refraction_index.BK7, pos=[0, 0, 10], d=1.5))
        RT.add(ot.Detector(ot.RectangularSurface(dim=[4, 4]), pos=[0, 0, 30]))

        key = jax.random.PRNGKey(7)
        render, _ = make_fused_render(RT, 20000, 0, (-2, 2, -2, 2),
                                      Nx=63, Ny=63)
        img_scatter = np.asarray(render(key))

        ot.global_options.pallas_binning = True
        try:
            render2, _ = make_fused_render(RT, 20000, 0, (-2, 2, -2, 2),
                                           Nx=63, Ny=63)
            img_pallas = np.asarray(render2(key))
        finally:
            ot.global_options.pallas_binning = False

        np.testing.assert_allclose(img_scatter, img_pallas, atol=1e-5)
        assert img_pallas[..., 3].sum() > 0.5
