#!/usr/bin/env python3
"""Le Grand full theoretical eye: paraxial properties and retinal PSF
(headless port of reference examples/legrand_eye_model.py)."""

import optrace_tpu as ot
from optrace_tpu import plots
from optrace_tpu.presets.geometry import legrand_eye

RT = ot.Raytracer(outline=[-8, 8, -8, 8, -20, 30])
RT.add(ot.RaySource(ot.CircularSurface(r=1.5), divergence="None",
                    spectrum=ot.LightSpectrum("Monochromatic", wl=546), pos=[0, 0, -10]))
RT.add(legrand_eye())

if __name__ == "__main__":
    tma = RT.tma()
    print(f"eye power: {tma.powers_n[1]:.2f} dpt, efl: {tma.efl:.3f} mm")
    print(f"focal points: {tma.focal_points}")
    RT.trace(500_000)
    img = RT.detector_image()
    plots.image_plot(img.get("Irradiance", 189), path="legrand_eye_psf.png")
    print("saved legrand_eye_psf.png")
