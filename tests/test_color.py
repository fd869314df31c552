"""Color subsystem tests: conversions round-trip, oracle parity vs the
reference implementation, gamut mapping semantics.

Mirrors the reference's test_color.py strategy (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import optrace_tpu.color as color
from tests.reference_oracle import get_reference

ot_ref = get_reference()
needs_oracle = pytest.mark.skipif(ot_ref is None, reason="reference unavailable")


def rand_xyz(n=500, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1.2, (1, n, 3)).astype(np.float32)


class TestObservers:

    def test_peak_positions(self):
        wl = jnp.linspace(380, 780, 4001)
        assert abs(float(wl[jnp.argmax(color.y_observer(wl))]) - 555.0) < 3
        assert abs(float(wl[jnp.argmax(color.z_observer(wl))]) - 446.0) < 5

    def test_zero_outside(self):
        assert float(color.x_observer(jnp.array([200.0]))[0]) == 0.0
        assert float(color.y_observer(jnp.array([900.0]))[0]) == 0.0

    @needs_oracle
    def test_oracle(self):
        from optrace.tracer.color import x_observer, y_observer, z_observer
        wl = np.linspace(380, 780, 801)
        np.testing.assert_allclose(np.asarray(color.x_observer(wl)), x_observer(wl), atol=2e-4)
        np.testing.assert_allclose(np.asarray(color.y_observer(wl)), y_observer(wl), atol=2e-4)
        np.testing.assert_allclose(np.asarray(color.z_observer(wl)), z_observer(wl), atol=2e-4)


class TestIlluminants:

    def test_names(self):
        for n in ["A", "D65", "F11", "LED-B1"]:
            assert n in color.ILLUMINANT_NAMES

    def test_d65_chromaticity(self):
        wl = jnp.linspace(380, 780, 401)
        spec = color.illuminant("D65", wl)
        xyz = color.xyz_from_spectrum(wl, spec)
        s = float(jnp.sum(xyz))
        x, y = float(xyz[0]) / s, float(xyz[1]) / s
        assert abs(x - 0.31272) < 2e-3
        assert abs(y - 0.32903) < 2e-3

    def test_e_constant(self):
        v = color.illuminant("E", jnp.array([400.0, 600.0]))
        assert np.allclose(np.asarray(v), 100.0)

    def test_unknown(self):
        with pytest.raises(ValueError):
            color.illuminant("XYZ123", jnp.array([500.0]))


class TestConversions:

    def test_srgb_gamma_roundtrip(self):
        v = jnp.linspace(-0.2, 1.2, 101)
        back = color.srgb_linear_to_srgb(color.srgb_to_srgb_linear(v))
        np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)

    def test_xyz_srgb_roundtrip_in_gamut(self):
        rng = np.random.default_rng(1)
        rgb = rng.uniform(0.05, 1, (1, 200, 3)).astype(np.float32)
        xyz = color.srgb_to_xyz(rgb)
        rgb2 = color.xyz_to_srgb(xyz, normalize=False)
        np.testing.assert_allclose(np.asarray(rgb2), rgb, atol=2e-3)

    def test_luv_roundtrip(self):
        xyz = rand_xyz()
        luv = color.xyz_to_luv(xyz, normalize=False)
        xyz2 = color.luv_to_xyz(luv)
        np.testing.assert_allclose(np.asarray(xyz2), np.asarray(jnp.clip(xyz, 0, None)),
                                   atol=1e-3, rtol=1e-3)

    def test_xyY_roundtrip(self):
        xyz = rand_xyz(seed=2)
        xyy = color.xyz_to_xyY(xyz)
        xyz2 = color.xyY_to_xyz(xyy)
        np.testing.assert_allclose(np.asarray(xyz2), xyz, atol=1e-4, rtol=1e-4)

    def test_black_maps_to_whitepoint(self):
        xyy = color.xyz_to_xyY(np.zeros((1, 1, 3)))
        np.testing.assert_allclose(np.asarray(xyy[0, 0, :2]), color.WP_D65_XY, atol=1e-6)

    @needs_oracle
    def test_oracle_luv(self):
        from optrace.tracer.color import xyz_to_luv as ref_luv
        xyz = rand_xyz(seed=3).astype(np.float64)
        ours = np.asarray(color.xyz_to_luv(xyz))
        theirs = ref_luv(xyz.copy())
        np.testing.assert_allclose(ours, theirs, atol=5e-3)

    @needs_oracle
    def test_oracle_srgb_absolute(self):
        from optrace.tracer.color import xyz_to_srgb as ref_srgb
        xyz = rand_xyz(seed=4).astype(np.float64)
        ours = np.asarray(color.xyz_to_srgb(xyz, rendering_intent="Absolute"))
        theirs = ref_srgb(xyz.copy(), rendering_intent="Absolute")
        # f32 vs f64 flips borderline in/out-of-gamut decisions on a few pixels
        close = np.abs(ours - theirs) < 5e-3
        assert close.mean() > 0.97
        assert np.median(np.abs(ours - theirs)) < 1e-3

    @needs_oracle
    def test_oracle_srgb_perceptual(self):
        from optrace.tracer.color import xyz_to_srgb as ref_srgb
        xyz = rand_xyz(seed=5).astype(np.float64)
        ours = np.asarray(color.xyz_to_srgb(xyz, rendering_intent="Perceptual"))
        theirs = ref_srgb(xyz.copy(), rendering_intent="Perceptual")
        close = np.abs(ours - theirs) < 5e-3
        assert close.mean() > 0.97
        assert np.median(np.abs(ours - theirs)) < 1e-3

    @needs_oracle
    def test_oracle_outside_gamut(self):
        from optrace.tracer.color import outside_srgb_gamut as ref_out
        xyz = rand_xyz(seed=6).astype(np.float64)
        ours = np.asarray(color.outside_srgb_gamut(xyz))
        theirs = ref_out(xyz.copy())
        assert (ours == theirs).mean() > 0.99


class TestPrimaries:

    def test_primary_chromaticities(self):
        """The synthetic primaries must sit exactly on the sRGB primaries
        in the xy chromaticity diagram."""
        wl = jnp.linspace(380, 780, 4001)
        for prim, xy in [(color.srgb_r_primary, color.SRGB_R_XY),
                         (color.srgb_g_primary, color.SRGB_G_XY),
                         (color.srgb_b_primary, color.SRGB_B_XY)]:
            xyz = color.xyz_from_spectrum(wl, prim(wl), method="trapz")
            s = float(jnp.sum(xyz))
            assert abs(float(xyz[0]) / s - xy[0]) < 1e-3
            assert abs(float(xyz[1]) / s - xy[1]) < 1e-3

    def test_power_factors(self):
        """Power factors = radiant power ratios of the primaries."""
        wl = jnp.linspace(380, 780, 8001)
        Pr = float(jnp.trapezoid(color.srgb_r_primary(wl), wl))
        Pg = float(jnp.trapezoid(color.srgb_g_primary(wl), wl))
        Pb = float(jnp.trapezoid(color.srgb_b_primary(wl), wl))
        assert abs(Pr / Pg - color.SRGB_PRIMARY_POWER_FACTORS[0]) < 1e-3
        assert abs(Pb / Pg - color.SRGB_PRIMARY_POWER_FACTORS[2]) < 1e-3

    def test_random_wavelengths_red_pixel(self):
        key = jax.random.PRNGKey(0)
        rgb = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (5000, 1))
        wl = np.asarray(color.random_wavelengths_from_srgb(key, rgb))
        # red primary peaks near 640 nm
        assert 600 < np.median(wl) < 680

    def test_random_wavelengths_white_mixture(self):
        key = jax.random.PRNGKey(1)
        rgb = jnp.tile(jnp.array([[1.0, 1.0, 1.0]]), (20000, 1))
        wl = np.asarray(color.random_wavelengths_from_srgb(key, rgb))
        # white contains all three primaries
        assert (wl < 500).mean() > 0.1
        assert ((wl > 500) & (wl < 600)).mean() > 0.2
        assert (wl > 600).mean() > 0.2


class TestMisc:

    def test_dominant_wavelength_green(self):
        wl_d = color.dominant_wavelength(np.array([0.3, 0.6, 0.1]))
        assert 500 < wl_d < 570

    def test_spectral_colormap_shape(self):
        m = color.spectral_colormap(jnp.linspace(380, 780, 50))
        assert m.shape == (50, 4)
        assert float(jnp.min(m)) >= 0 and float(jnp.max(m)) <= 1

    def test_log_srgb(self):
        rng = np.random.default_rng(2)
        img = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
        out = np.asarray(color.log_srgb(img))
        assert out.shape == img.shape
        assert np.all(np.isfinite(out))

    def test_log_srgb_black(self):
        img = np.zeros((4, 4, 3), dtype=np.float32)
        out = np.asarray(color.log_srgb(img))
        np.testing.assert_allclose(out, 0.0, atol=1e-7)

    def test_blackbody_peak(self):
        # Wien: peak at ~2.898e6/T nm; for 5000 K → ~580 nm
        wl = jnp.linspace(380, 780, 2001)
        bb = color.blackbody(wl, T=5000.0)
        peak = float(wl[jnp.argmax(bb)])
        assert abs(peak - 579.6) < 5
