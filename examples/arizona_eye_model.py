#!/usr/bin/env python3
"""Arizona schematic eye: retinal image of a point source and of a scene
(headless port of reference examples/arizona_eye_model.py)."""

import optrace_tpu as ot
from optrace_tpu import plots
from optrace_tpu.presets.geometry import arizona_eye

RT = ot.Raytracer(outline=[-8, 8, -8, 8, -40, 30])

RS = ot.RaySource(ot.CircularSurface(r=1.0), divergence="None",
                  spectrum=ot.presets.light_spectrum.d65, pos=[0, 0, -20])
RT.add(RS)
RT.add(arizona_eye(adaptation=0.0))

if __name__ == "__main__":
    tma = RT.tma()
    print(f"eye power: {tma.powers_n[1]:.2f} dpt (literature ~60 dpt)")
    RT.trace(1_000_000)
    img = RT.detector_image()     # retina is a spherical detector
    plots.image_plot(img.get("sRGB (Absolute RI)", 189), path="arizona_eye_psf.png")
    print("saved arizona_eye_psf.png; retinal power:", f"{img.power():.4f} W")
