#!/usr/bin/env python3
"""Spherical aberration of a singlet lens: paraxial rays and marginal rays
focus at different distances (headless port of reference
examples/spherical_aberration.py)."""

import optrace_tpu as ot
from optrace_tpu import plots

RT = ot.Raytracer(outline=[-10, 10, -10, 10, -25, 40])

# paraxial bundle and marginal ring bundle
RS0 = ot.RaySource(ot.CircularSurface(r=1), divergence="None",
                   spectrum=ot.presets.light_spectrum.d65, pos=[0, 0, -15])
RS1 = ot.RaySource(ot.RingSurface(r=4.5, ri=1), divergence="None",
                   spectrum=ot.presets.light_spectrum.d65, pos=[0, 0, -15])
RT.add(RS0)
RT.add(RS1)

n = ot.RefractionIndex("Constant", n=1.5)
L = ot.Lens(ot.SphericalSurface(r=5, R=15), ot.SphericalSurface(r=5, R=-15),
            de=0.2, pos=[0, 0, 0], n=n)
RT.add(L)

RT.add(ot.Detector(ot.RectangularSurface(dim=[10, 10]), pos=[0, 0, 23.0]))

if __name__ == "__main__":
    RT.trace(1_000_000)
    res0, _ = RT.focus_search("RMS Spot Size", z_start=18, source_index=0)
    res1, _ = RT.focus_search("RMS Spot Size", z_start=18, source_index=1)
    print(f"paraxial focus: {res0.x:.3f} mm, marginal focus: {res1.x:.3f} mm "
          f"(spherical aberration: {res0.x - res1.x:.3f} mm)")
    img = RT.detector_image()
    plots.image_plot(img.get("Irradiance", 315), log=True, path="spherical_aberration.png")
    print("saved spherical_aberration.png")
