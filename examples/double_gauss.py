#!/usr/bin/env python3
"""Nikkor-Wakamiya 100mm f/1.4 double gauss: PSFs of point sources at
several field angles (headless port of reference examples/double_gauss.py,
prescription from patent US4448497)."""

import numpy as np
import optrace_tpu as ot
from optrace_tpu import plots
from optrace_tpu.presets.geometry import double_gauss

RT = ot.Raytracer(outline=[-2000, 2000, -22000, 2000, -50001, 180], no_pol=True)

g = 50000.0
for deg in [0, 5, 10]:
    xp = g * np.tan(np.radians(deg))
    RT.add(ot.RaySource(ot.Point(), divergence="Isotropic", orientation="Converging",
                        conv_pos=[0, 0, 0], div_angle=0.03, pos=[0, -xp, -g],
                        desc=f"{deg}°", spectrum=ot.presets.light_spectrum.d65))

RT.add(double_gauss())

if __name__ == "__main__":
    tma = RT.tma()
    print(f"efl = {tma.efl:.2f} mm (design: 100 mm)")
    RT.trace(1_000_000)
    for i, deg in enumerate([0, 5, 10]):
        img = RT.detector_image(source_index=i)
        plots.image_plot(img.get("sRGB (Absolute RI)", 189),
                         path=f"double_gauss_psf_{deg}deg.png")
    print("saved double_gauss_psf_{0,5,10}deg.png")
