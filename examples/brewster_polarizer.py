#!/usr/bin/env python3
"""Brewster-angle polarizer: p-polarized light passes a tilted glass plate
losslessly, s-polarized light loses ~15% per surface (headless port of
reference examples/brewster_polarizer.py)."""

import numpy as np
import optrace_tpu as ot

n_glass = ot.presets.refraction_index.BK7
n_d = float(np.asarray(n_glass(np.array([587.56])))[0])
brewster = np.degrees(np.arctan(n_d))
print(f"Brewster angle for BK7: {brewster:.2f}°")

th = np.radians(brewster)
normal = [0.0, float(np.sin(th)), float(np.cos(th))]

for pol, label in [("y", "p-polarized"), ("x", "s-polarized"), ("Uniform", "unpolarized")]:
    RT = ot.Raytracer(outline=[-50, 50, -50, 50, -40, 120])
    RT.add(ot.RaySource(ot.CircularSurface(r=0.5), pos=[0, 0, -5], divergence="None",
                        polarization=pol,
                        spectrum=ot.LightSpectrum("Monochromatic", wl=587.56)))
    RT.add(ot.Lens(ot.TiltedSurface(r=10, normal=normal), ot.CircularSurface(r=40),
                   n=n_glass, n2=n_glass, pos=[0, 0, 10], d1=0.1, d2=45))
    with ot.global_options.no_warnings():
        RT.trace(100_000)
    T = RT.rays.w_list[:, 1].sum() / RT.rays.w_list[:, 0].sum()
    print(f"{label:>12}: transmission through first surface T = {T:.4f}")
