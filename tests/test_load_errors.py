"""Loader error paths and synthetic-file coverage
(reference tests/test_load.py exception matrix)."""

import numpy as np
import pytest

import optrace_tpu as ot


BASE_ZMX = """MODE SEQ
NAME synthetic test lens
UNIT MM X W X Y
SURF 0
  TYPE STANDARD
  CURV 0.0
  DISZ INFINITY
SURF 1
  TYPE STANDARD
  CURV 0.05
  DIAM 5
  GLAS ___BLANK 0 0 1.5168 64.17 0 0 0 0
  DISZ 3.0
SURF 2
  TYPE STANDARD
  CURV -0.05
  DIAM 5
  DISZ 10.0
SURF 3
  TYPE STANDARD
  CURV 0.0
  DIAM 4
  DISZ 0.0
"""


def _write(tmp_path, text, name="t.zmx", encoding="utf-8"):
    f = tmp_path / name
    f.write_text(text, encoding=encoding)
    return str(f)


class TestZmxErrors:

    def test_unsupported_unit(self, tmp_path):
        with pytest.raises(RuntimeError, match="Unsupported Unit"):
            ot.load_zmx(_write(tmp_path, BASE_ZMX.replace("UNIT MM", "UNIT IN")))

    def test_unsupported_mode(self, tmp_path):
        with pytest.raises(RuntimeError, match="Unsupported Mode"):
            ot.load_zmx(_write(tmp_path, BASE_ZMX.replace("MODE SEQ", "MODE NSEQ")))

    def test_missing_material(self, tmp_path):
        bad = BASE_ZMX.replace("GLAS ___BLANK 0 0 1.5168 64.17 0 0 0 0",
                               "GLAS UNOBTAINIUM 0 0")
        with pytest.raises(RuntimeError, match="missing in n_dict"):
            ot.load_zmx(_write(tmp_path, bad))

    def test_unsupported_surface_type(self, tmp_path):
        bad = BASE_ZMX.replace("SURF 1\n  TYPE STANDARD",
                               "SURF 1\n  TYPE TOROIDAL")
        with pytest.raises(RuntimeError, match="not supported"):
            ot.load_zmx(_write(tmp_path, bad))

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            ot.load_zmx("/nonexistent/file.zmx")


class TestZmxFeatures:

    def test_blank_glass_becomes_abbe(self, tmp_path):
        G = ot.load_zmx(_write(tmp_path, BASE_ZMX))
        assert len(G.lenses) == 1
        n = G.lenses[0].n
        # Abbe model reproduces the nd/V from the GLAS record
        nd = float(n(np.array([587.5618]))[0])
        assert nd == pytest.approx(1.5168, abs=2e-4)

    def test_named_glass_resolved_from_catalog(self, tmp_path):
        text = BASE_ZMX.replace("___BLANK", "MYGLASS")
        n_dict = {"MYGLASS": ot.presets.refraction_index.BK7}
        G = ot.load_zmx(_write(tmp_path, text), n_dict=n_dict)
        assert G.lenses[0].n is n_dict["MYGLASS"]

    def test_geometry_placement(self, tmp_path):
        G = ot.load_zmx(_write(tmp_path, BASE_ZMX))
        L = G.lenses[0]
        assert L.front.pos[2] == pytest.approx(0.0, abs=1e-9)
        assert L.back.pos[2] == pytest.approx(3.0, abs=1e-9)
        assert L.front.R == pytest.approx(20.0)
        assert L.back.R == pytest.approx(-20.0)
        # trailing passive surface becomes the image-plane detector
        assert len(G.detectors) == 1
        assert G.detectors[0].pos[2] == pytest.approx(13.0, abs=1e-9)

    def test_stop_becomes_ring_aperture(self, tmp_path):
        text = BASE_ZMX.replace(
            "SURF 3\n  TYPE STANDARD\n  CURV 0.0\n  DIAM 4\n  DISZ 0.0\n",
            "SURF 3\n  TYPE STANDARD\n  CURV 0.0\n  DIAM 2\n  STOP\n  DISZ 5.0\n"
            "SURF 4\n  TYPE STANDARD\n  CURV 0.0\n  DIAM 4\n  DISZ 0.0\n")
        G = ot.load_zmx(_write(tmp_path, text))
        assert len(G.apertures) == 1
        ap = G.apertures[0]
        assert ap.pos[2] == pytest.approx(13.0, abs=1e-9)

    def test_even_asphere(self, tmp_path):
        text = BASE_ZMX.replace(
            "SURF 1\n  TYPE STANDARD\n  CURV 0.05\n  DIAM 5",
            "SURF 1\n  TYPE EVENASPH\n  CURV 0.05\n  DIAM 5\n"
            "  PARM 1 0.0\n  PARM 2 1e-5")
        G = ot.load_zmx(_write(tmp_path, text))
        front = G.lenses[0].front
        assert type(front).__name__ == "AsphericSurface"
        assert front.coeff[1] == pytest.approx(1e-5)

    def test_utf16_encoding(self, tmp_path):
        f = _write(tmp_path, BASE_ZMX, name="t16.zmx", encoding="utf-16")
        G = ot.load_zmx(f)
        assert len(G.lenses) == 1

    def test_no_marker(self, tmp_path):
        G1 = ot.load_zmx(_write(tmp_path, BASE_ZMX), no_marker=True)
        G2 = ot.load_zmx(_write(tmp_path, BASE_ZMX), no_marker=False)
        assert len(G1.markers) == 0
        assert len(G2.markers) == 1


AGF_BLOCK = """NM TESTGLAS 2 0 1.51680 64.17 0
ED 0 0 0 0 0
CD 1.03961212 0.00600069867 0.231792344 0.0200179144 1.01046945 103.560653
TD 0 0 0 0 0 0 0
LD 0.3 2.5
"""


class TestAgf:

    def test_sellmeier_block(self, tmp_path):
        f = tmp_path / "t.agf"
        f.write_text(AGF_BLOCK)
        with ot.global_options.no_warnings():
            cat = ot.load_agf(str(f))
        assert "TESTGLAS" in cat
        # AGF formula 2 = Sellmeier1, here with BK7 coefficients
        n550 = float(cat["TESTGLAS"](np.array([550.0]))[0])
        ref = float(ot.presets.refraction_index.BK7(np.array([550.0]))[0])
        assert n550 == pytest.approx(ref, abs=1e-6)

    def test_unknown_formula_skipped(self, tmp_path):
        f = tmp_path / "t.agf"
        f.write_text(AGF_BLOCK.replace("NM TESTGLAS 2", "NM TESTGLAS 99"))
        with ot.global_options.no_warnings():
            cat = ot.load_agf(str(f))
        assert "TESTGLAS" not in cat

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            ot.load_agf("/nonexistent/file.agf")
