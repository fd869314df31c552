"""Distribution tests for the stateless samplers (ops/sampling.py).

Models the reference's distribution-test philosophy (SURVEY.md §4:
sampled distributions must match target pdfs; reference
tests/test_tracer.py:446-635).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from optrace_tpu.ops import sampling


KEY = jax.random.PRNGKey(7)


class TestStratified:

    def test_interval_bounds_and_uniformity(self):
        x = np.asarray(sampling.stratified_interval_sampling(KEY, 20000, 2.0, 5.0))
        assert x.min() >= 2.0 and x.max() <= 5.0
        # stratification: each of N cells has exactly one sample
        cells = np.floor((np.sort(x) - 2.0) / 3.0 * 20000).astype(int)
        counts = np.bincount(np.clip(cells, 0, 19999), minlength=20000)
        # f32 rounding can push a sample across a cell edge; allow a few
        assert (counts == 1).mean() > 0.99

    def test_interval_shuffled(self):
        x = np.asarray(sampling.stratified_interval_sampling(KEY, 1000, 0.0, 1.0))
        # shuffled: not monotone
        assert not np.all(np.diff(x) > 0)

    def test_rectangle(self):
        x, y = sampling.stratified_rectangle_sampling(KEY, 10000, -1.0, 1.0, 3.0, 7.0)
        x, y = np.asarray(x), np.asarray(y)
        assert x.min() >= -1 and x.max() <= 1
        assert y.min() >= 3 and y.max() <= 7
        # uniformity via ks test on each axis
        assert scipy.stats.kstest((x + 1) / 2, "uniform").pvalue > 1e-4
        assert scipy.stats.kstest((y - 3) / 4, "uniform").pvalue > 1e-4

    def test_rectangle_non_square_count(self):
        x, y = sampling.stratified_rectangle_sampling(KEY, 1003, 0.0, 1.0, 0.0, 1.0)
        assert x.shape == (1003,) and y.shape == (1003,)

    def test_ring_area_uniform(self):
        ri, r = 0.5, 2.0
        x, y = sampling.stratified_ring_sampling(KEY, 50000, ri, r)
        rho = np.hypot(np.asarray(x), np.asarray(y))
        assert rho.min() >= ri * (1 - 1e-5) and rho.max() <= r * (1 + 1e-5)
        # equal-area: rho² uniform in [ri², r²]
        u = (rho ** 2 - ri ** 2) / (r ** 2 - ri ** 2)
        assert scipy.stats.kstest(u, "uniform").pvalue > 1e-4
        # angles uniform
        phi = np.arctan2(np.asarray(y), np.asarray(x))
        assert scipy.stats.kstest((phi + np.pi) / (2 * np.pi), "uniform").pvalue > 1e-4

    def test_disc_sampling(self):
        x, y = sampling.stratified_ring_sampling(KEY, 20000, 0.0, 1.0)
        rho = np.hypot(np.asarray(x), np.asarray(y))
        assert rho.max() <= 1 + 1e-6
        assert scipy.stats.kstest(rho ** 2, "uniform").pvalue > 1e-4

    def test_ring_polar_output(self):
        rho, phi = sampling.stratified_ring_sampling(KEY, 1000, 0.2, 1.0, polar=True)
        assert np.all(np.asarray(rho) >= 0.2 - 1e-6)


class TestInverseTransform:

    def test_continuous_gaussian(self):
        x = jnp.linspace(-5, 5, 2001)
        f = jnp.exp(-0.5 * x ** 2)
        s = np.asarray(sampling.inverse_transform_sampling(KEY, 50000, x, f))
        assert abs(s.mean()) < 0.02
        assert abs(s.std() - 1.0) < 0.02
        assert scipy.stats.kstest(s, "norm").pvalue > 1e-5

    def test_continuous_linear_pdf(self):
        # pdf f(x)=2x on [0,1]
        x = jnp.linspace(0, 1, 1001)
        s = np.asarray(sampling.inverse_transform_sampling(KEY, 40000, x, 2 * x))
        assert scipy.stats.kstest(s ** 2, "uniform").pvalue > 1e-4

    def test_discrete(self):
        vals = jnp.array([450.0, 550.0, 650.0])
        probs = jnp.array([0.2, 0.5, 0.3])
        s = np.asarray(sampling.inverse_transform_sampling(KEY, 50000, vals, probs, kind="discrete"))
        assert set(np.unique(s)) <= {450.0, 550.0, 650.0}
        frac = np.mean(s == 550.0)
        assert abs(frac - 0.5) < 0.02

    def test_bad_kind(self):
        with pytest.raises(ValueError):
            sampling.inverse_transform_sampling(KEY, 10, jnp.arange(4.0), jnp.ones(4), kind="nope")

    def test_reproducible(self):
        a = sampling.inverse_transform_sampling(KEY, 100, jnp.linspace(0, 1, 100), jnp.ones(100))
        b = sampling.inverse_transform_sampling(KEY, 100, jnp.linspace(0, 1, 100), jnp.ones(100))
        assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_jit_compatible(self):
        fn = jax.jit(lambda k: sampling.stratified_ring_sampling(k, 256, 0.1, 1.0))
        x, y = fn(KEY)
        assert x.shape == (256,)


class TestSamplingNumericalSafety:

    def test_axial_polarization_finite(self):
        """Near-axial rays (f32 normalize can round s_z one ulp above 1)
        must still get unit polarization vectors — the transverse frame is
        built from s_xy, not 1/sqrt(1-s_z²) (regression: converging point
        sources produced ~1e23 polarization garbage and inf ray weights)."""
        import jax
        import optrace_tpu as ot

        RS = ot.RaySource(ot.CircularSurface(r=0.05), divergence="Isotropic",
                          orientation="Converging", conv_pos=[0, 0, 0],
                          div_angle=0.15, pos=[0, 0, -1333],
                          spectrum=ot.presets.light_spectrum.d65,
                          polarization="Uniform")
        p, s, pol, w, wl = RS.create_rays(jax.random.PRNGKey(5), 50000,
                                          no_pol=False, power=1)
        pol = np.asarray(pol)
        assert np.all(np.isfinite(pol))
        norms = np.linalg.norm(pol, axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
        # transverse: pol ⟂ s
        dots = np.abs(np.sum(np.asarray(s) * pol, axis=-1))
        assert dots.max() < 1e-3

    def test_small_cone_isotropic_distribution(self):
        """cos(theta) is uniform on the cap even for tiny cones where
        arccos(1-r²) would quantize in f32 (regression: theta = 2·asin(r/√2))."""
        import jax
        import optrace_tpu as ot

        RS = ot.RaySource(ot.Point(), divergence="Isotropic",
                          orientation="Constant", s=[0, 0, 1],
                          div_angle=0.05, pos=[0, 0, 0],
                          spectrum=ot.LightSpectrum("Monochromatic", wl=550))
        _, s, _, _, _ = RS.create_rays(jax.random.PRNGKey(0), 100000,
                                       no_pol=True, power=1)
        s = np.asarray(s, dtype=np.float64)
        a = np.radians(0.05)
        # measure theta via sin(theta) = |s_xy| — full f32 resolution near 0,
        # unlike s_z = cos(theta) which quantizes at ulp(1.0)
        sin_t = np.hypot(s[:, 0], s[:, 1])
        # reference formula: cos(theta) = 1 - r² with r² uniform in
        # [0, sin²a] (ray_source.py:313-317), so P(theta < x) = (1-cos x)/sin²a
        x = np.radians(0.0435)
        frac = (sin_t < np.sin(x)).mean()
        expected = (1 - np.cos(x)) / np.sin(a) ** 2
        assert frac == pytest.approx(expected, abs=0.01)
        # the quantized arccos gave ~6 discrete levels; require many more
        assert np.unique(np.round(np.degrees(np.arcsin(np.clip(sin_t, 0, 1))), 7)).size > 1000
