#!/usr/bin/env python3
"""Iterative (megabatched) render at 2·10⁷ rays through the ideal camera —
the out-of-core mode for high-quality images (headless port of reference
examples/image_render_many_rays.py)."""

import optrace_tpu as ot
from optrace_tpu import plots
from optrace_tpu.presets.geometry import ideal_camera

RT = ot.Raytracer(outline=[-8, 8, -8, 8, -60, 35], no_pol=True)

img = ot.presets.image.tv_testcard1(s=[8, 8])
RS = ot.RaySource(img, divergence="Lambertian", div_angle=5, pos=[0, 0, -50])
RT.add(RS)
RT.add(ideal_camera(cam_pos=[0, 0, 0], z_g=-50, b=25, r=4, r_det=5))

if __name__ == "__main__":
    imgs = RT.iterative_render(20_000_000)
    plots.image_plot(imgs[0].get("sRGB (Absolute RI)", 315), flip=True,
                     path="image_render_many_rays.png")
    print("saved image_render_many_rays.png; power:", f"{imgs[0].power():.4f} W")
