"""ZEMAX import tests using the reference's public fixture files
(read-only; tests skip if the reference tree is absent)."""

import os
import numpy as np
import pytest

import optrace_tpu as ot

SCHOTT_AGF = "/root/reference/examples/resources/materials/schott.agf"
MICROSCOPE_ZMX = "/root/reference/examples/resources/microscope/Nikon_1p25NA_60x_US7889433B2_MultiConfig_v2.zmx"
EDMUND_ZMX = "/root/reference/tests/test_files/edmund_zmx/files/zmax_49360.zmx"

needs_files = pytest.mark.skipif(not os.path.isfile(SCHOTT_AGF), reason="fixture files absent")


@needs_files
class TestAGF:

    def test_load_schott(self):
        with ot.global_options.no_warnings():
            cat = ot.load_agf(SCHOTT_AGF)
        assert len(cat) > 50
        assert "N-BK7" in cat
        nd = float(np.asarray(cat["N-BK7"](np.array([587.5618])))[0])
        assert nd == pytest.approx(1.5168, abs=2e-4)

    def test_catalog_matches_preset(self):
        with ot.global_options.no_warnings():
            cat = ot.load_agf(SCHOTT_AGF)
        wl = np.linspace(400, 750, 36)
        np.testing.assert_allclose(np.asarray(cat["N-BK7"](wl)),
                                   np.asarray(ot.presets.refraction_index.BK7(wl)), rtol=1e-6)

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            ot.load_agf("/nonexistent/file.agf")


@needs_files
class TestZMX:

    def test_load_edmund(self):
        with ot.global_options.no_warnings():
            n_dict = ot.load_agf(SCHOTT_AGF)
            G = ot.load_zmx(EDMUND_ZMX, n_dict=n_dict)
        assert len(G.lenses) >= 1
        assert len(G.detectors) == 1

    def test_load_microscope(self):
        """the 57-surface benchmark microscope"""
        with ot.global_options.no_warnings():
            n_dict = ot.load_agf(SCHOTT_AGF)
            for name in ["/root/reference/examples/resources/materials/ohara.agf",
                         "/root/reference/examples/resources/materials/hikari.agf",
                         "/root/reference/examples/resources/materials/hoya.agf"]:
                if os.path.isfile(name):
                    n_dict |= ot.load_agf(name)
            G = ot.load_zmx(MICROSCOPE_ZMX, n_dict=n_dict)
        n_surf = len(G.tracing_surfaces)
        assert n_surf > 30
        tma = G.tma()
        assert np.isfinite(tma.efl)

    @pytest.mark.slow
    def test_trace_microscope(self):
        with ot.global_options.no_warnings():
            n_dict = {}
            for name in [SCHOTT_AGF,
                         "/root/reference/examples/resources/materials/ohara.agf",
                         "/root/reference/examples/resources/materials/hikari.agf",
                         "/root/reference/examples/resources/materials/hoya.agf"]:
                if os.path.isfile(name):
                    n_dict |= ot.load_agf(name)
            G = ot.load_zmx(MICROSCOPE_ZMX, n_dict=n_dict)
            ext = G.extent
            RT = ot.Raytracer(outline=[ext[0] - 2, ext[1] + 2, ext[2] - 2, ext[3] + 2,
                                       ext[4] - 10, ext[5] + 10], no_pol=True)
            RT.add(G)
            RT.add(ot.RaySource(ot.Point(), pos=[0, 0, ext[4] - 5], divergence="Isotropic",
                                div_angle=20, spectrum=ot.LightSpectrum("Monochromatic", wl=550)))
            RT.trace(20000)
        w = RT.rays.w_list
        # some light passes the microscope
        assert w[:, -2].sum() > 0
