#!/usr/bin/env python3
"""Astigmatism of oblique incidence on a spherical lens: tangential and
sagittal foci separate for a tilted beam (headless port of reference
examples/astigmatism.py)."""

import numpy as np
import optrace_tpu as ot
from optrace_tpu import plots

RT = ot.Raytracer(outline=[-12, 12, -25, 12, -10, 80])

theta = 20.0   # field angle in degrees
th = np.radians(theta)
RT.add(ot.RaySource(ot.CircularSurface(r=1.5), pos=[0, -12 * np.tan(th), -8],
                    divergence="None", s_sph=[theta, 90],
                    spectrum=ot.LightSpectrum("Monochromatic", wl=550)))

n = ot.presets.refraction_index.BK7
RT.add(ot.Lens(ot.SphericalSurface(r=5, R=25), ot.SphericalSurface(r=5, R=-25),
               n=n, pos=[0, 0, 4], d=1.5))

if __name__ == "__main__":
    RT.trace(500_000)
    res, fsdict = RT.focus_search("RMS Spot Size", z_start=30, return_cost=True)
    print(f"best overall focus at z = {res.x:.2f} mm "
          f"(between the separated tangential and sagittal line foci)")
    plots.focus_search_cost_plot(res, fsdict, path="astigmatism_cost.png")
    print("saved astigmatism_cost.png")
