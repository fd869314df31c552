"""Plot smoke tests: every plot function renders to a file headlessly
(reference test_plots.py strategy, without GUI interaction)."""

import os

import numpy as np
import pytest
import scipy.optimize

import optrace_tpu as ot
from optrace_tpu import plots


@pytest.fixture
def tmp_png(tmp_path):
    return str(tmp_path / "plot.png")


class TestPlots:

    def test_image_plot(self, tmp_png):
        img = ot.RGBImage(np.random.default_rng(0).uniform(0, 1, (32, 32, 3)), s=[2, 2])
        plots.image_plot(img, path=tmp_png)
        assert os.path.getsize(tmp_png) > 0

    def test_image_plot_log_flip(self, tmp_png):
        img = ot.ScalarImage(np.random.default_rng(0).uniform(0, 1, (32, 32)), s=[2, 2],
                             quantity="Irradiance")
        plots.image_plot(img, log=True, flip=True, path=tmp_png)
        assert os.path.getsize(tmp_png) > 0

    def test_image_profile_plot(self, tmp_png):
        img = ot.RGBImage(np.random.default_rng(0).uniform(0, 1, (32, 32, 3)), s=[2, 2])
        plots.image_profile_plot(img, x=0.0, path=tmp_png)
        assert os.path.getsize(tmp_png) > 0
        with pytest.raises(ValueError):
            plots.image_profile_plot(img)

    def test_spectrum_plot(self, tmp_png):
        plots.spectrum_plot(ot.presets.light_spectrum.d65, path=tmp_png)
        assert os.path.getsize(tmp_png) > 0

    def test_spectrum_plot_list_and_lines(self, tmp_png):
        plots.spectrum_plot([ot.presets.light_spectrum.d65,
                             ot.presets.light_spectrum.FDC], path=tmp_png)
        assert os.path.getsize(tmp_png) > 0

    def test_refraction_index_plot(self, tmp_png):
        plots.refraction_index_plot(ot.presets.refraction_index.BK7, path=tmp_png)
        assert os.path.getsize(tmp_png) > 0

    def test_abbe_plot(self, tmp_png):
        plots.abbe_plot([ot.presets.refraction_index.BK7,
                         ot.presets.refraction_index.SF10], path=tmp_png)
        assert os.path.getsize(tmp_png) > 0

    def test_surface_profile_plot(self, tmp_png):
        plots.surface_profile_plot(ot.SphericalSurface(r=3, R=10), path=tmp_png)
        assert os.path.getsize(tmp_png) > 0

    def test_chromaticity_plots(self, tmp_png):
        plots.chromaticities_cie_1931(ot.presets.light_spectrum.d65, path=tmp_png)
        assert os.path.getsize(tmp_png) > 0
        plots.chromaticities_cie_1976([ot.presets.light_spectrum.d65], path=tmp_png)
        assert os.path.getsize(tmp_png) > 0

    def test_focus_cost_plot(self, tmp_png):
        res = scipy.optimize.OptimizeResult()
        res.x, res.fun = 10.0, 0.5
        fsdict = dict(z=np.linspace(0, 20, 50), cost=np.random.default_rng(0).uniform(0, 1, 50))
        plots.focus_search_cost_plot(res, fsdict, path=tmp_png)
        assert os.path.getsize(tmp_png) > 0
        with pytest.raises(RuntimeError):
            plots.focus_search_cost_plot(res, dict(z=None, cost=None))
