#!/usr/bin/env python3
"""Scene imaging through an ideal camera: an RGB image source imaged onto
the detector (headless port of reference examples/image_render.py)."""

import optrace_tpu as ot
from optrace_tpu import plots
from optrace_tpu.presets.geometry import ideal_camera

RT = ot.Raytracer(outline=[-8, 8, -8, 8, -60, 35])

# image source: preset scene on a 8x8mm emitter at z=-50
img = ot.presets.image.color_checker(s=[8, 8])
RS = ot.RaySource(img, divergence="Lambertian", div_angle=5, pos=[0, 0, -50])
RT.add(RS)

RT.add(ideal_camera(cam_pos=[0, 0, 0], z_g=-50, b=25, r=4, r_det=5))

if __name__ == "__main__":
    RT.trace(2_000_000)
    dimg = RT.detector_image()
    plots.image_plot(dimg.get("sRGB (Absolute RI)", 315), flip=True,
                     path="image_render.png")
    print("saved image_render.png; power:", f"{dimg.power():.4f} W")
