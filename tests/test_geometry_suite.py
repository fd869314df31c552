"""Breadth tests on the shared mixed-media fixture scene.

Mirrors the reference's error-path exhaustiveness sweep
(reference tests/test_tracer.py:919-1010) and its iterative_render variant
matrix, on the tracing_geometry() fixture.
"""

import numpy as np
import pytest

import optrace_tpu as ot
from tests.fixture_scene import tracing_geometry


@pytest.fixture(scope="module")
def traced_rt():
    with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
        RT = tracing_geometry()
        RT.trace(20000)
    return RT


class TestErrorPaths:

    def test_untraced_render_calls(self):
        RT = tracing_geometry()
        with pytest.raises(RuntimeError):
            RT.detector_image()
        with pytest.raises(RuntimeError):
            RT.detector_spectrum()
        with pytest.raises(RuntimeError):
            RT.source_image()
        with pytest.raises(RuntimeError):
            RT.source_spectrum()

    def test_invalid_indices(self, traced_rt):
        RT = traced_rt
        for bad in (3, -3):
            with pytest.raises(IndexError):
                RT.detector_image(detector_index=bad)
            with pytest.raises(IndexError):
                RT.detector_spectrum(detector_index=bad)
            with pytest.raises(IndexError):
                RT.detector_image(source_index=bad)
            with pytest.raises(IndexError):
                RT.detector_spectrum(source_index=bad)
            with pytest.raises(IndexError):
                RT.source_image(source_index=bad)
            with pytest.raises(IndexError):
                RT.source_spectrum(source_index=bad)

    def test_invalid_extent(self, traced_rt):
        RT = traced_rt
        with pytest.raises(ValueError):
            RT.detector_image(extent="abc")
        with pytest.raises(ValueError):
            RT.detector_image(extent=[1, 2, 1, np.inf])
        with pytest.raises(ValueError):
            RT.detector_spectrum(extent="abc")
        with pytest.raises(ValueError):
            RT.detector_spectrum(extent=[1, 2, 1, np.inf])

    def test_missing_elements(self):
        with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
            RT = tracing_geometry()
            RT.trace(2000)
        RT.detectors = []
        with pytest.raises(RuntimeError):
            RT.detector_image()
        with pytest.raises(RuntimeError):
            RT.detector_spectrum()
        RT.ray_sources = []
        with pytest.raises(RuntimeError):
            RT.source_image()
        with pytest.raises(RuntimeError):
            RT.source_spectrum()


class TestFixtureScene:

    def test_source_power_split(self, traced_rt):
        """source 2 has power=2, source 1 power=1"""
        s0 = traced_rt.source_spectrum(source_index=0)
        s1 = traced_rt.source_spectrum(source_index=1)
        p0, p1 = s0.power(), s1.power()
        assert p1 == pytest.approx(2 * p0, rel=0.02)

    def test_source_image_extents(self, traced_rt):
        img0 = traced_rt.source_image(source_index=0)
        img1 = traced_rt.source_image(source_index=1)
        # both sources are r=1 disks; source 2 is centered at y=1
        np.testing.assert_allclose(img0.extent, [-1, 1, -1, 1], atol=1e-6)
        np.testing.assert_allclose(img1.extent, [-1, 1, 0, 2], atol=1e-6)

    def test_both_detectors_render(self, traced_rt):
        img0 = traced_rt.detector_image(detector_index=0)
        img1 = traced_rt.detector_image(detector_index=1)
        assert img0.power() > 0
        assert img1.power() > 0

    def test_spherical_detector_projections(self, traced_rt):
        for pm in ("Equidistant", "Stereographic", "Equal-Area", "Orthographic"):
            img = traced_rt.detector_image(detector_index=1, projection_method=pm)
            assert img.projection == pm
            assert np.all(np.isfinite(img.data))

    def test_detector_spectrum_lines(self, traced_rt):
        """detector 1 (z=40) sits BEFORE the 460 nm filter (z=45.2), so its
        spectrum keeps the full FDC+d65 mix — dominated by the sodium
        D-line spike of the FDC source at 589 nm"""
        spec1 = traced_rt.detector_spectrum(detector_index=1)
        wls = np.linspace(400, 700, 301)
        v = np.asarray(spec1(wls))
        assert v.max() > 0
        assert abs(wls[np.argmax(v)] - 589) < 15

    def test_source_selective_detector_image(self, traced_rt):
        """source-sliced detector images are additive, and source 2's
        offset disk (y in [0,2]) only half-overlaps the 2x2 detector, so
        it lands ~half of its 2.0 W there"""
        imgA = traced_rt.detector_image(detector_index=0, source_index=0)
        imgB = traced_rt.detector_image(detector_index=0, source_index=1)
        imgAB = traced_rt.detector_image(detector_index=0)
        assert imgA.power() == pytest.approx(1.0, abs=0.02)
        assert imgB.power() == pytest.approx(1.0, abs=0.05)
        assert imgA.power() + imgB.power() == pytest.approx(imgAB.power(),
                                                            rel=1e-6)


class TestIterativeRenderVariants:
    """reference test_tracer.py:955-1010"""

    def _rt(self):
        with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
            RT = tracing_geometry()
        RT.ITER_RAYS_STEP = 4000
        return RT

    def test_default(self):
        RT = self._rt()
        with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
            dim = RT.iterative_render(8000)
        assert len(dim) == 1
        assert dim[0].limit is None

    def test_pos_extent_index_projection_limit(self):
        RT = self._rt()
        with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
            dim = RT.iterative_render(4000, pos=[0, 0, 13.3])
            assert len(dim) == 1

            ext2 = [0.0, *np.asarray(RT.detectors[0].extent)[1:4]]
            dim = RT.iterative_render(4000, extent=ext2)
            np.testing.assert_allclose(dim[0].extent, ext2)

            dim = RT.iterative_render(4000, detector_index=1)
            assert len(dim) == 1

            dim = RT.iterative_render(4000, detector_index=1,
                                      projection_method="Stereographic")
            assert dim[0].projection == "Stereographic"

            dim = RT.iterative_render(4000, detector_index=0, limit=5)
            assert dim[0].limit == 5

    def test_multi_position(self):
        RT = self._rt()
        with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
            dim = RT.iterative_render(4000, pos=[[0, 0, 13.3], [0, 0, 30.0]],
                                      extent=[[-1, 1, -1, 1], [-1, 1, -1, 1]])
        assert len(dim) == 2
        assert dim[0].power() > 0 and dim[1].power() > 0
