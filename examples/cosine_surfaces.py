#!/usr/bin/env python3
"""User-defined function surfaces: a lens with crossed cosine-modulated
faces produces a structured PSF (headless port of reference
examples/cosine_surfaces.py)."""

import jax.numpy as jnp
import optrace_tpu as ot
from optrace_tpu import plots

RT = ot.Raytracer(outline=[-5, 5, -5, 5, -10, 60])

RT.add(ot.RaySource(ot.CircularSurface(r=2.5), divergence="None",
                    spectrum=ot.LightSpectrum("Monochromatic", wl=550), pos=[0, 0, -5]))

front = ot.FunctionSurface2D(r=3, func=lambda x, y: 0.05 * jnp.cos(4 * jnp.pi * x),
                             z_min=-0.05, z_max=0.05)
back = ot.FunctionSurface2D(r=3, func=lambda x, y: 0.05 * jnp.cos(4 * jnp.pi * y),
                            z_min=-0.05, z_max=0.05)
RT.add(ot.Lens(front, back, n=ot.presets.refraction_index.PMMA, pos=[0, 0, 0], d=0.5))
RT.add(ot.Detector(ot.RectangularSurface(dim=[8, 8]), pos=[0, 0, 40]))

if __name__ == "__main__":
    RT.trace(500_000)
    img = RT.detector_image()
    plots.image_plot(img.get("Irradiance", 315), log=True, path="cosine_surfaces.png")
    print("saved cosine_surfaces.png; power:", f"{img.power():.4f} W")
