#!/usr/bin/env python3
"""Achromatic doublet: crown+flint cemented pair cancels the chromatic
focal shift (headless port of reference examples/achromat.py)."""

import optrace_tpu as ot
from optrace_tpu import plots

RT = ot.Raytracer(outline=[-5, 5, -5, 5, -10, 80])

RS = ot.RaySource(ot.CircularSurface(r=2.5), divergence="None",
                  spectrum=ot.presets.light_spectrum.FDC,
                  pos=[0, 0, -5])
RT.add(RS)

# BK7 crown + SF10 flint cemented doublet (catalog-style prescription)
bk7 = ot.presets.refraction_index.BK7
sf10 = ot.presets.refraction_index.SF10

L1 = ot.Lens(ot.SphericalSurface(r=3, R=33.55), ot.SphericalSurface(r=3, R=-27.05),
             n=bk7, n2=sf10, pos=[0, 0, 0], d1=0, d2=2.8)
L2 = ot.Lens(ot.SphericalSurface(r=3, R=-27.05), ot.SphericalSurface(r=3, R=-96.08),
             n=sf10, pos=[0, 0, 2.8 + 1e-6], d1=0, d2=1.0)
RT.add(L1)
RT.add(L2)

RT.add(ot.Detector(ot.RectangularSurface(dim=[2, 2]), pos=[0, 0, 60]))

if __name__ == "__main__":
    RT.trace(500_000)
    # per-line focus: the achromat brings F and C lines to a common focus
    for wl, name in [(486.13, "F"), (587.56, "d"), (656.27, "C")]:
        tma = ot.TMA(RT.lenses, wl=wl)
        print(f"line {name} ({wl:.1f} nm): focal point at {tma.focal_points[1]:.4f} mm")
    res, _ = RT.focus_search("RMS Spot Size", z_start=40)
    RT.detectors[0].move_to([0, 0, res.x])
    img = RT.detector_image()
    plots.image_plot(img.get("sRGB (Absolute RI)", 189), path="achromat.png")
    print(f"best focus at {res.x:.3f} mm; saved achromat.png")
