#!/usr/bin/env python3
"""Gallery of the material presets: dispersion curves and the Abbe diagram
(headless port of reference examples/refraction_index_presets.py)."""

import optrace_tpu as ot
from optrace_tpu import plots

glasses = ot.presets.refraction_index.glasses[:8]
plots.refraction_index_plot(glasses, title="Glass Dispersion", path="glass_dispersion.png")
plots.abbe_plot(ot.presets.refraction_index.glasses[:12], path="abbe_diagram.png")

for n in glasses:
    print(f"{n.get_desc():>14}: V = {n.abbe_number():6.2f}")
print("saved glass_dispersion.png, abbe_diagram.png")
