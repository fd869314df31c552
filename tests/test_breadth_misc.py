"""Breadth tests for storage, image modes, group transforms and locking
(reference test_image.py / test_geometry.py / test_misc.py coverage areas).
"""

import numpy as np
import pytest

import optrace_tpu as ot


def _traced_rt(N=20000, wl=550.0):
    RT = ot.Raytracer(outline=[-5, 5, -5, 5, -10, 40])
    RT.add(ot.RaySource(ot.CircularSurface(r=1), pos=[0, 0, -5],
                        divergence="None",
                        spectrum=ot.LightSpectrum("Monochromatic", wl=wl)))
    RT.add(ot.Lens(ot.SphericalSurface(r=3, R=20),
                   ot.SphericalSurface(r=3, R=-20),
                   n=ot.presets.refraction_index.BK7, pos=[0, 0, 10], d=1.5))
    RT.add(ot.Detector(ot.RectangularSurface(dim=[4, 4]), pos=[0, 0, 30]))
    with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
        RT.trace(N)
    return RT


@pytest.fixture(scope="module")
def rt():
    return _traced_rt()


@pytest.fixture(scope="module")
def rimg(rt):
    with ot.global_options.no_progress_bar():
        return rt.detector_image(extent=[-2, 2, -2, 2])


class TestRenderImageModes:

    def test_all_modes_finite(self, rimg):
        for mode in ot.RenderImage.image_modes:
            out = rimg.get(mode, 63)
            d = np.asarray(out.data, dtype=np.float64)
            assert np.all(np.isfinite(d)), mode

    def test_mode_value_ranges(self, rimg):
        L = np.asarray(rimg.get("Lightness (CIELUV)", 63).data)
        assert L.min() >= 0 and L.max() <= 100 + 1e-6
        hue = np.asarray(rimg.get("Hue (CIELUV)", 63).data)
        assert hue.min() >= -360 and hue.max() <= 360
        sat = np.asarray(rimg.get("Saturation (CIELUV)", 63).data)
        assert sat.min() >= 0
        irr = np.asarray(rimg.get("Irradiance", 63).data)
        assert irr.min() >= 0
        srgb = np.asarray(rimg.get("sRGB (Absolute RI)", 63).data)
        assert srgb.min() >= 0 and srgb.max() <= 1 + 1e-6

    def test_invalid_mode(self, rimg):
        with pytest.raises(ValueError):
            rimg.get("NotAMode", 63)

    def test_all_pixel_sizes(self, rimg):
        for npx in ot.RenderImage.SIZES[6:]:
            out = rimg.get("Irradiance", npx)
            assert max(out.shape[:2]) <= ot.RenderImage.MAX_IMAGE_SIDE

    def test_save_load_roundtrip(self, rimg, tmp_path):
        f = str(tmp_path / "img.npz")
        rimg.save(f)
        img2 = ot.RenderImage.load(f)
        np.testing.assert_allclose(np.asarray(img2.data),
                                   np.asarray(rimg.data))
        np.testing.assert_allclose(img2.extent, rimg.extent)
        assert img2.projection == rimg.projection


class TestRayStorageAPI:

    def test_rays_by_mask_selection(self, rt):
        N = rt.rays.N
        ch = np.zeros(N, dtype=bool)
        ch[::2] = True
        p, s, pol, w, wl, snum, n = rt.rays.rays_by_mask(ch)
        assert p.shape == (N // 2 + N % 2, rt.rays.Nt, 3)
        assert np.all(snum == 0)
        # directions are normalized section diffs
        norms = np.linalg.norm(s[:, 0], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-9)

    def test_optical_lengths_glass(self, rt):
        """on-axis ray: OPL of the in-glass section = n(550) x geometric"""
        N = rt.rays.N
        r = np.hypot(rt.rays.p_list[:, 0, 0], rt.rays.p_list[:, 0, 1])
        axial = int(np.argmin(r))
        ch = np.zeros(N, dtype=bool)
        ch[axial] = True
        ols = rt.rays.optical_lengths(ch)[0]
        ls = rt.rays.ray_lengths(ch)[0]
        n550 = float(ot.presets.refraction_index.BK7(np.array([550.0]))[0])
        # section 1 = inside the lens (source->front = section 0)
        assert ols[1] == pytest.approx(n550 * ls[1], rel=1e-6)
        # air sections: OPL == geometric length (n0 = 1.00027)
        assert ols[0] == pytest.approx(ls[0], rel=1e-3)

    def test_source_numbers(self, rt):
        sn = rt.rays.source_numbers()
        assert sn.shape == (rt.rays.N,)
        assert np.all(sn == 0)


class TestGroupTransforms:

    def _group(self):
        G = ot.Group()
        G.add(ot.Lens(ot.SphericalSurface(r=3, R=20),
                      ot.SphericalSurface(r=3, R=-30),
                      n=ot.presets.refraction_index.BK7, pos=[0, 0, 10], d=1.5))
        G.add(ot.Lens(ot.SphericalSurface(r=3, R=15),
                      ot.SphericalSurface(r=3, R=-15),
                      n=ot.presets.refraction_index.F2, pos=[0, 0, 20], d=1.0))
        return G

    def test_rotate_moves_positions(self):
        G = self._group()
        for L in G.lenses:
            L.move_to([1.0, 0.0, L.pos[2]])
        G.rotate(90.0)
        for L in G.lenses:
            np.testing.assert_allclose(L.pos[:2], [0.0, 1.0], atol=1e-9)

    def test_rotate_preserves_tma(self):
        G = self._group()
        efl0 = G.tma().efl
        G.rotate(37.0)
        assert G.tma().efl == pytest.approx(efl0, rel=1e-9)

    def test_flip_reverses_order_and_media(self):
        G = self._group()
        efl0 = G.tma().efl
        z_front0 = G.lenses[0].front.pos[2]
        z_back1 = G.lenses[1].back.pos[2]
        G.flip()
        # element order reversed: the F2 lens now comes first
        assert G.lenses[0].n.desc == "F2" or "F2" in G.lenses[0].n.crepr()
        # geometry mirrored about the group z-center
        zc = (z_front0 + z_back1) / 2
        np.testing.assert_allclose(G.lenses[1].back.pos[2],
                                   2 * zc - z_front0, atol=1e-9)
        # a flipped system has the same |efl| (mirror symmetry of TMA)
        assert abs(G.tma().efl) == pytest.approx(abs(efl0), rel=1e-9)

    def test_double_flip_identity(self):
        G = self._group()
        pos0 = [list(L.pos) for L in G.lenses]
        efl0 = G.tma().efl
        G.flip()
        G.flip()
        for L, p0 in zip(G.lenses, pos0):
            np.testing.assert_allclose(L.pos, p0, atol=1e-9)
        assert G.tma().efl == pytest.approx(efl0, rel=1e-12)


class TestLocking:

    def test_locked_surface_raises(self):
        s = ot.SphericalSurface(r=3, R=20)
        s.lock()
        with pytest.raises(RuntimeError):
            s.r = 4

    def test_copy_of_locked_is_usable(self):
        s = ot.SphericalSurface(r=3, R=20)
        s.lock()
        c = s.copy()
        assert c.R == s.R

    def test_new_attribute_forbidden_after_lock(self):
        s = ot.CircularSurface(r=1)
        s.lock()
        with pytest.raises(RuntimeError):
            s.nonexistent_attr = 1
