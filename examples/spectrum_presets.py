#!/usr/bin/env python3
"""Gallery of the light-spectrum presets (headless port of reference
examples/spectrum_presets.py)."""

import optrace_tpu as ot
from optrace_tpu import plots

plots.spectrum_plot(ot.presets.light_spectrum.standard_natural,
                    title="Standard Illuminants", path="spectra_natural.png")
plots.spectrum_plot(ot.presets.light_spectrum.standard_f,
                    title="Fluorescent Illuminants", path="spectra_f.png")
plots.spectrum_plot(ot.presets.light_spectrum.srgb[:3],
                    title="sRGB Primaries", path="spectra_srgb.png")
plots.chromaticities_cie_1931(ot.presets.light_spectrum.standard_natural,
                              path="chromaticities.png")
print("saved spectra_*.png, chromaticities.png")
