#!/usr/bin/env python3
"""PSF convolution imaging: image a scene by convolving with a traced PSF
instead of tracing every ray (headless port of reference
examples/psf_imaging.py)."""

import optrace_tpu as ot
from optrace_tpu import plots

# object scene and an aberrated-lens PSF
img = ot.presets.image.ETDRS_chart(s=[1.5, 1.5])
psf = ot.presets.psf.halo(sig1=1.0, sig2=0.5, r=8.0, a=0.2)

with ot.global_options.no_warnings():
    out = ot.convolve(img, psf, m=-1)     # m<0: real image is flipped

plots.image_plot(out, path="psf_imaging.png")
print("saved psf_imaging.png; output size", out.shape)
