"""Spectrum / RefractionIndex tests with oracle comparisons."""

import numpy as np
import jax
import pytest

import optrace_tpu as ot
from tests.reference_oracle import get_reference

ot_ref = get_reference()
needs_oracle = pytest.mark.skipif(ot_ref is None, reason="reference unavailable")

KEY = jax.random.PRNGKey(3)


class TestSpectrum:

    def test_types_eval(self):
        assert np.allclose(np.asarray(ot.Spectrum("Constant", val=0.5)(np.array([400., 600.]))), 0.5)
        r = ot.Spectrum("Rectangle", wl0=500, wl1=600)(np.array([450., 550., 650.]))
        assert np.allclose(np.asarray(r), [0, 1, 0])
        g = ot.Spectrum("Gaussian", mu=550, sig=50)(np.array([550.]))
        assert float(g[0]) == pytest.approx(1.0)

    def test_discontinuous_call_raises(self):
        with pytest.raises(RuntimeError):
            ot.Spectrum("Monochromatic", wl=550)(np.array([550.]))

    def test_validation(self):
        with pytest.raises(ValueError):
            ot.Spectrum("Bogus")
        with pytest.raises(ValueError):
            ot.Spectrum("Gaussian", mu=100)      # outside visible range
        with pytest.raises(ValueError):
            ot.Spectrum("Gaussian", sig=-1)
        with pytest.raises(ValueError):
            ot.LightSpectrum("Lines", lines=[500, 500], line_vals=[1, 1])

    def test_data_spectrum(self):
        wls = np.linspace(400, 700, 31)
        vals = np.ones(31)
        s = ot.Spectrum("Data", wls=wls, vals=vals)
        assert float(s(np.array([550.]))[0]) == pytest.approx(1.0)
        assert float(s(np.array([380.]))[0]) == 0.0


class TestLightSpectrum:

    def test_random_wavelengths_gaussian(self):
        s = ot.LightSpectrum("Gaussian", mu=550, sig=20)
        wl = np.asarray(s.random_wavelengths(KEY, 20000))
        assert abs(wl.mean() - 550) < 1
        assert abs(wl.std() - 20) < 1

    def test_random_wavelengths_lines(self):
        s = ot.LightSpectrum("Lines", lines=[450., 550.], line_vals=[1., 3.])
        wl = np.asarray(s.random_wavelengths(KEY, 20000))
        assert set(np.unique(wl)) <= {np.float32(450.), np.float32(550.)}
        assert abs((wl == 550).mean() - 0.75) < 0.02

    def test_random_wavelengths_blackbody(self):
        s = ot.LightSpectrum("Blackbody", T=3000)
        wl = np.asarray(s.random_wavelengths(KEY, 20000))
        # 3000K: red-heavy spectrum
        assert wl.mean() > 580

    def test_render_histogram(self):
        rng = np.random.default_rng(0)
        wl = rng.normal(550, 20, 10000).clip(400, 700)
        w = np.ones(10000) * 1e-4
        spec = ot.LightSpectrum.render(wl, w)
        assert spec.spectrum_type == "Histogram"
        assert spec.power() == pytest.approx(1.0, rel=1e-6)
        assert abs(spec.peak_wavelength() - 550) < 15

    def test_color_of_d65(self):
        rgb = ot.presets.light_spectrum.d65.color(rendering_intent="Absolute", clip=True)
        # D65 is the sRGB whitepoint -> nearly equal channels
        assert abs(rgb[0] - rgb[1]) < 0.02
        assert abs(rgb[1] - rgb[2]) < 0.02

    def test_fwhm_gaussian(self):
        s = ot.LightSpectrum("Gaussian", mu=550, sig=30)
        assert s.fwhm() == pytest.approx(2.355 * 30, rel=0.01)

    def test_luminous_power(self):
        s = ot.LightSpectrum("Monochromatic", wl=555, val=1.0)
        # 555nm: peak of y_observer -> 683 lm/W
        assert s.luminous_power() == pytest.approx(683, rel=0.01)

    @needs_oracle
    def test_oracle_blackbody(self):
        from optrace.tracer.spectrum import LightSpectrum as RefLS
        ref = RefLS("Blackbody", T=5000)
        mine = ot.LightSpectrum("Blackbody", T=5000)
        wl = np.linspace(380, 780, 101)
        np.testing.assert_allclose(np.asarray(mine(wl)), ref(wl), rtol=1e-3)


class TestTransmissionSpectrum:

    def test_inverse(self):
        t = ot.TransmissionSpectrum("Gaussian", mu=550, sig=50, inverse=True)
        assert float(t(np.array([550.]))[0]) == pytest.approx(0.0, abs=1e-6)

    def test_validation(self):
        with pytest.raises(ValueError):
            ot.TransmissionSpectrum("Constant", val=1.5)
        with pytest.raises(ValueError):
            ot.TransmissionSpectrum("Monochromatic")

    def test_color_with_alpha(self):
        t = ot.TransmissionSpectrum("Constant", val=1.0)
        r, g, b, alpha = t.color()
        assert alpha == pytest.approx(0.0, abs=1e-4)   # fully transparent


class TestRefractionIndex:

    def test_bk7_at_d_line(self):
        n = ot.presets.refraction_index.BK7
        nd = float(np.asarray(n(np.array([587.5618])))[0])
        assert nd == pytest.approx(1.5168, abs=2e-4)

    def test_abbe_number_bk7(self):
        V = ot.presets.refraction_index.BK7.abbe_number()
        assert V == pytest.approx(64.17, abs=0.5)

    def test_abbe_model_roundtrip(self):
        n = ot.RefractionIndex("Abbe", n=1.6, V=40)
        assert n.abbe_number() == pytest.approx(40, rel=1e-3)
        nd = float(np.asarray(n(np.array([587.5618])))[0])
        assert nd == pytest.approx(1.6, abs=1e-6)

    def test_constant_not_dispersive(self):
        assert not ot.RefractionIndex("Constant", n=1.5).is_dispersive()
        assert ot.presets.refraction_index.BK7.is_dispersive()

    def test_all_presets_valid(self):
        wl = np.linspace(380, 780, 41)
        for n in ot.presets.refraction_index.all_presets:
            vals = np.asarray(n(wl))
            assert np.all(vals >= 1.0), n.get_desc()
            assert np.all(np.isfinite(vals)), n.get_desc()

    def test_coeff_count_enforced(self):
        with pytest.raises(ValueError):
            ot.RefractionIndex("Sellmeier1", coeff=[1, 2, 3])

    def test_n_below_1_raises(self):
        with pytest.raises(RuntimeError):
            ot.RefractionIndex("Cauchy", coeff=[0.9, 0, 0, 0])(np.array([550.]))

    @needs_oracle
    def test_oracle_models(self):
        from optrace.tracer import RefractionIndex as RefRI
        wl = np.linspace(380, 780, 41)
        cases = [
            ("Sellmeier1", [1.03961212, 0.00600069867, 0.231792344, 0.0200179144, 1.01046945, 103.560653]),
            ("Cauchy", [1.45, 0.005, 0.0001, 0.0]),
            ("Conrady", [1.47, 0.015, 3.5e-5]),
            ("Schott", [2.27, -0.01, 0.014, 0.0002, -1e-5, 1e-6]),
            ("Herzberger", [1.5, 0.01, 0.001, -0.001, 1e-5, -1e-7]),
        ]
        for model, coeff in cases:
            mine = np.asarray(ot.RefractionIndex(model, coeff=list(coeff))(wl))
            theirs = RefRI(model, coeff=list(coeff))(wl)
            np.testing.assert_allclose(mine, theirs, rtol=1e-5, err_msg=model)
