#!/usr/bin/env python3
"""Spherical detector projection methods: the same wide-angle signal
unwrapped with the four azimuthal projections (headless port of reference
examples/sphere_projections.py)."""

import optrace_tpu as ot
from optrace_tpu import plots

RT = ot.Raytracer(outline=[-12, 12, -12, 12, -10, 40])
RT.add(ot.RaySource(ot.Point(), pos=[0, 0, 0], divergence="Isotropic", div_angle=60,
                    spectrum=ot.presets.light_spectrum.d65))
RT.add(ot.Detector(ot.SphericalSurface(r=9, R=-10), pos=[0, 0, 20]))

if __name__ == "__main__":
    RT.trace(1_000_000)
    for method in ["Equidistant", "Orthographic", "Equal-Area", "Stereographic"]:
        img = RT.detector_image(projection_method=method)
        plots.image_plot(img.get("Irradiance", 189),
                         path=f"sphere_projection_{method.replace(' ', '_')}.png")
    print("saved sphere_projection_*.png")
