"""Generate the documentation gallery images (docs/images/*.png).

Renders a handful of representative results with the library itself —
PSFs, a dispersed spectrum, a retinal image, the GUI scene, an Abbe plot —
at modest ray counts so the script stays fast on the CPU backend:

    python tools/make_doc_images.py

Committed outputs keep the docs self-contained; re-run after changes that
alter rendering to refresh them.
"""

import os
import sys

if os.environ.get("JAX_PLATFORMS") != "cpu":
    env = dict(os.environ, JAX_PLATFORMS="cpu", MPLBACKEND="Agg")
    env.pop("PYTHONPATH", None)
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "docs", "images")
os.makedirs(OUT, exist_ok=True)

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

import optrace_tpu as ot
from optrace_tpu import plots as otp

ot.global_options.show_progress_bar = False
DPI = 110


def save(name):
    plt.gcf().set_dpi(DPI)
    plt.savefig(os.path.join(OUT, name), bbox_inches="tight", dpi=DPI)
    plt.close("all")
    print("wrote", name, flush=True)


def double_gauss_psf():
    G = ot.presets.geometry.double_gauss(with_detector=False)
    z_img = G.tma().image_position(-50000)
    RT = ot.Raytracer(outline=[-60, 60, -60, 60, -50001, z_img + 10], no_pol=True)
    RT.add(ot.RaySource(ot.Point(), divergence="Isotropic",
                        orientation="Converging", conv_pos=[0, 0, 0],
                        div_angle=0.05, pos=[0, 0, -50000],
                        spectrum=ot.presets.light_spectrum.d65))
    RT.add(G)
    RT.add(ot.Detector(ot.RectangularSurface(dim=[2, 2]), pos=[0, 0, z_img]))
    RT.trace(400_000)
    img = RT.detector_image(extent=[-0.1, 0.1, -0.1, 0.1])
    otp.image_plot(img.get("sRGB (Absolute RI)", 189))
    save("double_gauss_psf.png")


def prism_spectrum():
    """The examples/prism.py geometry: D65 beam dispersed by an SF10 prism."""
    n = ot.presets.refraction_index.SF10
    RT = ot.Raytracer(outline=[-5, 5, -5, 5, -5, 25], no_pol=True)
    RT.add(ot.RaySource(ot.CircularSurface(r=0.05), divergence="None",
                        spectrum=ot.presets.light_spectrum.d65,
                        pos=[0, -2.5, 0], s=[0, 0.3, 0.7]))
    front = ot.TiltedSurface(r=3, normal=[0, -0.45, float(np.sqrt(1 - 0.45 ** 2))])
    back = front.copy()
    back.rotate(180)
    RT.add(ot.Lens(front, back, de=0.5, pos=[0, 0, 10], n=n))
    RT.add(ot.Detector(ot.RectangularSurface(dim=[10, 10]), pos=[0, 0, 20]))
    RT.trace(400_000)
    img = RT.detector_image()
    otp.image_plot(img.get("sRGB (Absolute RI)", 315))
    save("prism_spectrum.png")


def eye_retina():
    """Retinal view of an ETDRS chart: trace the Arizona eye's PSF for a
    distant point source, then convolve the chart with it (the
    examples/IOL_target_imaging.py method)."""
    g = 10_000.0                                      # 10 m object distance
    RT = ot.Raytracer(outline=[-8, 8, -8, 8, -g - 1, 30], no_pol=True)
    ang = float(np.degrees(np.arctan(3.0 / g)))
    RT.add(ot.RaySource(ot.Point(), divergence="Lambertian", div_angle=ang,
                        pos=[0, 0, -g], spectrum=ot.presets.light_spectrum.d65))
    RT.add(ot.presets.geometry.arizona_eye(adaptation=0.0))
    RT.trace(500_000)
    psf = RT.detector_image(extent=[-0.08, 0.08, -0.08, 0.08])
    m = ot.presets.geometry.arizona_eye().tma().image_magnification(-g)
    chart = ot.presets.image.ETDRS_chart([100.0, 100.0])  # 10 cm chart at 10 m
    img2 = ot.convolve(chart, psf, m=m, keep_size=True, padding_mode="edge")
    otp.image_plot(img2, flip=True, title="ETDRS chart through the Arizona eye")
    save("arizona_retina_chart.png")


def gui_scene():
    RT = ot.Raytracer(outline=[-6, 6, -6, 6, -12, 50])
    RT.add(ot.RaySource(ot.CircularSurface(r=1), pos=[0, 0, -8],
                        divergence="Lambertian", div_angle=6,
                        spectrum=ot.presets.light_spectrum.d65))
    RT.add(ot.Lens(ot.SphericalSurface(r=3, R=15), ot.SphericalSurface(r=3, R=-15),
                   n=ot.presets.refraction_index.BK7, pos=[0, 0, 0], d=1.2))
    RT.add(ot.Aperture(ot.RingSurface(r=4, ri=2.2), pos=[0, 0, 6]))
    RT.add(ot.Detector(ot.RectangularSurface(dim=[8, 8]), pos=[0, 0, 36]))
    from optrace_tpu.gui import TraceGUI
    gui = TraceGUI(RT, ray_count=30000, coloring_mode="Wavelength",
                   ray_opacity=0.06)
    gui.init_scene()
    gui.set_camera(direction=[0.3, -0.45, 1], height=45)
    gui.scene.fig.savefig(os.path.join(OUT, "gui_scene.png"), dpi=DPI)
    plt.close("all")
    print("wrote gui_scene.png", flush=True)


def abbe_plot():
    presets = [getattr(ot.presets.refraction_index, nm) for nm in
               ("BK7", "F2", "SF10", "BAF10", "LAK8", "FK51A")]
    otp.abbe_plot(presets)
    save("abbe_plot.png")


def chromaticity():
    specs = [ot.presets.light_spectrum.d65, ot.presets.light_spectrum.FDC]
    otp.chromaticities_cie_1931(specs)
    save("chromaticity_1931.png")


def focus_cost():
    RT = ot.Raytracer(outline=[-6, 6, -6, 6, -12, 60], no_pol=True)
    RT.add(ot.RaySource(ot.CircularSurface(r=1.5), pos=[0, 0, -8],
                        divergence="None", spectrum=ot.presets.light_spectrum.d65))
    RT.add(ot.Lens(ot.SphericalSurface(r=3, R=16), ot.SphericalSurface(r=3, R=-16),
                   n=ot.presets.refraction_index.BK7, pos=[0, 0, 0], d=1.0))
    RT.add(ot.Detector(ot.RectangularSurface(dim=[4, 4]), pos=[0, 0, 40]))
    RT.trace(200_000)
    res, fsdict = RT.focus_search("RMS Spot Size", z_start=20, return_cost=True)
    otp.focus_search_cost_plot(res, fsdict)
    save("focus_cost.png")


if __name__ == "__main__":
    with ot.global_options.no_warnings():
        double_gauss_psf()
        prism_spectrum()
        eye_retina()
        gui_scene()
        abbe_plot()
        chromaticity()
        focus_cost()
    print("gallery images done ->", OUT)
