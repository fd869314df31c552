#!/usr/bin/env python3
"""HURB edge diffraction: slit and pinhole far fields via Heisenberg
uncertainty ray bending (headless port of reference
examples/hurb_apertures.py)."""

import optrace_tpu as ot
from optrace_tpu import plots

for name, aperture in [
        ("slit", ot.SlitSurface(dim=[9, 9], dimi=[4.0, 0.02])),
        ("pinhole", ot.RingSurface(r=4.0, ri=0.01))]:
    RT = ot.Raytracer(outline=[-60, 60, -60, 60, -10, 510],
                      use_hurb=True, no_pol=True)
    RT.add(ot.RaySource(ot.CircularSurface(r=2.0), pos=[0, 0, -5], divergence="None",
                        spectrum=ot.LightSpectrum("Monochromatic", wl=550)))
    RT.add(ot.Aperture(aperture, pos=[0, 0, 0]))
    RT.add(ot.Detector(ot.RectangularSurface(dim=[110, 110]), pos=[0, 0, 500]))
    with ot.global_options.no_warnings():
        RT.trace(1_000_000)
    img = RT.detector_image(extent=[-40, 40, -40, 40])
    plots.image_plot(img.get("Irradiance", 315), log=True, path=f"hurb_{name}.png")
    print(f"saved hurb_{name}.png")
