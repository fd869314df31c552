#!/usr/bin/env python3
"""Prism dispersion: D65 white light split into its spectral components
(headless port of reference examples/prism.py — renders the detector image
to prism.png instead of opening the GUI)."""

import numpy as np
import optrace_tpu as ot
from optrace_tpu import plots

n = ot.presets.refraction_index.LAK8
print(f"Abbe Number of {n.desc}: {n.abbe_number():.4g}")

RT = ot.Raytracer(outline=[-5, 5, -5, 5, -5, 25])

RS = ot.RaySource(ot.CircularSurface(r=0.05), divergence="None",
                  spectrum=ot.presets.light_spectrum.d65,
                  pos=[0, -2.5, 0], s=[0, 0.3, 0.7])
RT.add(RS)

# prism from two tilted circular surfaces
front = ot.TiltedSurface(r=3, normal=[0, -0.45, float(np.sqrt(1 - 0.45 ** 2))])
back = front.copy()
back.rotate(180)
RT.add(ot.Lens(front, back, de=0.5, pos=[0, 0, 10], n=n))

RT.add(ot.Detector(ot.RectangularSurface(dim=[10, 10]), pos=[0, 0, 20]))

if __name__ == "__main__":
    RT.trace(500_000)
    img = RT.detector_image()
    plots.image_plot(img.get("sRGB (Absolute RI)", 315), path="prism.png")
    spec = RT.detector_spectrum()
    plots.spectrum_plot(spec, path="prism_spectrum.png")
    print("saved prism.png, prism_spectrum.png; detector power:", f"{img.power():.4f} W")
