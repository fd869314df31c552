#!/usr/bin/env python3
"""57-surface microscope (Nikon patent objective + eyepiece, the reference
benchmark geometry) imported from ZEMAX files and traced end to end
(headless port of reference examples/microscope.py)."""

import os

import optrace_tpu as ot
from optrace_tpu import plots

RES = "/root/reference/examples/resources"

if not os.path.isdir(RES):
    raise SystemExit("reference resource files not mounted — this example "
                     "needs the public .zmx/.agf fixtures")

with ot.global_options.no_warnings():
    n_dict = {}
    for cat in ["schott.agf", "ohara.agf", "hikari.agf", "hoya.agf"]:
        p = os.path.join(RES, "materials", cat)
        if os.path.isfile(p):
            n_dict |= ot.load_agf(p)

    G = ot.load_zmx(os.path.join(
        RES, "microscope", "Nikon_1p25NA_60x_US7889433B2_MultiConfig_v2.zmx"),
        n_dict=n_dict)

print(f"microscope: {len(G.lenses)} lenses, {len(G.tracing_surfaces)} tracing surfaces")

ext = G.extent
RT = ot.Raytracer(outline=[ext[0] - 2, ext[1] + 2, ext[2] - 2, ext[3] + 2,
                           ext[4] - 10, ext[5] + 10], no_pol=True)
RT.add(G)
RT.add(ot.RaySource(ot.Point(), pos=[0, 0, ext[4] - 5], divergence="Isotropic",
                    div_angle=25, spectrum=ot.LightSpectrum("Monochromatic", wl=550)))

if __name__ == "__main__":
    RT.trace(500_000)
    img = RT.detector_image()
    plots.image_plot(img.get("Irradiance", 189), path="microscope_psf.png")
    print("saved microscope_psf.png; detector power:", f"{img.power():.5f} W")
