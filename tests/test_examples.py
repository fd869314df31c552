"""Execute the example scripts end to end (reference test_examples.py
strategy): each runs headlessly in a temp directory with the ray count
capped for speed; outputs must exist."""

import os
import runpy
import pathlib

import pytest

import optrace_tpu as ot

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


@pytest.fixture
def example_env(tmp_path, monkeypatch):
    """run examples with capped ray counts in a temp cwd"""
    monkeypatch.chdir(tmp_path)

    orig_trace = ot.Raytracer.trace
    orig_iter = ot.Raytracer.iterative_render

    def capped_trace(self, N):
        return orig_trace(self, min(int(N), 50000))

    def capped_iter(self, N, **kwargs):
        self.ITER_RAYS_STEP = 25000
        return orig_iter(self, min(int(N), 50000), **kwargs)

    monkeypatch.setattr(ot.Raytracer, "trace", capped_trace)
    monkeypatch.setattr(ot.Raytracer, "iterative_render", capped_iter)
    ot.global_options.show_progress_bar = False
    ot.global_options.show_warnings = False
    yield tmp_path
    ot.global_options.show_progress_bar = True
    ot.global_options.show_warnings = True


def run_example(name):
    runpy.run_path(str(EXAMPLES / name), run_name="__main__")


@pytest.mark.parametrize("script,outputs", [
    ("prism.py", ["prism.png", "prism_spectrum.png"]),
    ("spherical_aberration.py", ["spherical_aberration.png"]),
    ("achromat.py", ["achromat.png"]),
    ("arizona_eye_model.py", ["arizona_eye_psf.png"]),
    ("legrand_eye_model.py", ["legrand_eye_psf.png"]),
    ("image_render.py", ["image_render.png"]),
    ("image_render_many_rays.py", ["image_render_many_rays.png"]),
    ("brewster_polarizer.py", []),
    ("astigmatism.py", ["astigmatism_cost.png"]),
    ("cosine_surfaces.py", ["cosine_surfaces.png"]),
    ("psf_imaging.py", ["psf_imaging.png"]),
    ("spectrum_presets.py", ["spectra_natural.png", "chromaticities.png"]),
    ("refraction_index_presets.py", ["abbe_diagram.png"]),
    ("sphere_projections.py", ["sphere_projection_Equidistant.png"]),
    ("hurb_apertures.py", ["hurb_slit.png", "hurb_pinhole.png"]),
    ("keratoconus.py", ["keratoconus_object.png", "keratoconus_case0.png",
                        "keratoconus_case7.png"]),
    ("IOL_pinhole_imaging.py", ["IOL_pinhole_0.01D.png", "IOL_pinhole_0.75D.png",
                                "IOL_pinhole_1.50D.png"]),
    ("IOL_target_imaging.py", ["IOL_target_0.01D.png", "IOL_target_0.75D.png",
                               "IOL_target_1.50D.png"]),
    ("lens_optimization.py", ["lens_optimization.png"]),
])
def test_example(example_env, script, outputs):
    run_example(script)
    for out in outputs:
        assert os.path.isfile(out), f"{script} did not produce {out}"
        assert os.path.getsize(out) > 0


@pytest.mark.slow
def test_double_gauss_example(example_env):
    run_example("double_gauss.py")
    assert os.path.isfile("double_gauss_psf_0deg.png")


@pytest.mark.slow
def test_microscope_example(example_env):
    if not os.path.isdir("/root/reference/examples/resources"):
        pytest.skip("fixtures absent")
    run_example("microscope.py")
    assert os.path.isfile("microscope_psf.png")


def test_gui_automation_example(example_env):
    """GUI scripting example: custom button + smart_replot-driven sweep
    (reference examples/gui_automation.py:1)."""
    import matplotlib
    matplotlib.use("Agg")
    mod = runpy.run_path(str(EXAMPLES / "gui_automation.py"), run_name="__main__")
    sim = mod["sim"]
    assert sim.raytracer.rays.N > 0
    # the custom button reruns the automation
    sim.press_custom_button("Rerun")
    assert sim.raytracer.check_if_rays_are_current()
    sim.close()
