"""Shared mixed-media tracing fixture (reference tests/tracing_geometry.py:10-88; named fixture_scene here to avoid namespace-package collision with the reference module).

A deliberately heterogeneous scene: two sources (different spectra,
polarizations, powers), a constant-index plano lens, two conic lenses, an
ideal lens, a ring aperture, a Gaussian filter, ambient-media changes
(n2 on lens 3), markers, volumes and two detectors (flat + spherical).
Used by the breadth tests to exercise every public Raytracer method on one
realistic geometry.
"""

import numpy as np
import jax.numpy as jnp

import optrace_tpu as ot


def tracing_geometry() -> ot.Raytracer:
    RT = ot.Raytracer(outline=[-5, 5, -5, 5, -5, 60])

    RT.add(ot.RaySource(ot.CircularSurface(r=1), divergence="None",
                        spectrum=ot.presets.light_spectrum.FDC,
                        pos=[0, 0, 0], s=[0, 0, 1], polarization="y"))
    RT.add(ot.RaySource(ot.CircularSurface(r=1), divergence="None", s=[0, 0, 1],
                        spectrum=ot.presets.light_spectrum.d65,
                        pos=[0, 1, -3], polarization="Constant",
                        pol_angle=25, power=2))

    # plano-plano high-index plate
    RT.add(ot.Lens(ot.CircularSurface(r=3), ot.CircularSurface(r=3), de=0.1,
                   pos=[0, 0, 2], n=ot.RefractionIndex("Constant", n=1.8)))

    # conic biconvex, Cauchy medium
    RT.add(ot.Lens(ot.ConicSurface(r=3, R=10, k=-0.444),
                   ot.ConicSurface(r=3, R=-10, k=-7.25), de=0.1,
                   pos=[0, 0, 10],
                   n=ot.RefractionIndex("Cauchy", coeff=[1.49, 0.00354, 0, 0])))

    # conic biconvex, constant high index
    RT.add(ot.Lens(ot.ConicSurface(r=3, R=5, k=-0.31),
                   ot.ConicSurface(r=3, R=-5, k=-3.04), de=0.6,
                   pos=[0, 0, 25], n=ot.RefractionIndex("Constant", n=1.8)))

    RT.add(ot.Aperture(ot.RingSurface(r=1, ri=0.01), pos=[0, 0, 20.3]))

    RT.add(ot.PointMarker("sdghj", [0, 1, 5]))
    RT.add(ot.LineMarker(r=2, angle=5, desc="sdghj", pos=[0, 1, 5]))

    # spherical lens with wavelength-dependent index and non-air far medium
    RT.add(ot.Lens(ot.SphericalSurface(r=1, R=2.2),
                   ot.SphericalSurface(r=1, R=-5), de=0.1, pos=[0, 0, 47],
                   n=ot.RefractionIndex("Function",
                                        func=lambda l: 1.8 - 0.007 * (l - 380) / 400),
                   n2=ot.RefractionIndex("Constant", n=1.1)))

    RT.add(ot.Filter(ot.CircularSurface(r=1), pos=[0, 0, 45.2],
                     spectrum=ot.TransmissionSpectrum(
                         "Function",
                         func=lambda l: jnp.exp(-0.5 * (l - 460) ** 2 / 20 ** 2))))

    RT.add(ot.Detector(ot.RectangularSurface(dim=[2, 2]), pos=[0, 0, 0]))
    RT.add(ot.Detector(ot.SphericalSurface(R=-1.1, r=1), pos=[0, 0, 40]))

    RT.add(ot.IdealLens(r=3, D=1, pos=[0, 0, RT.outline[5] - 1]))

    RT.add(ot.BoxVolume(dim=[3, 2], length=1, pos=[0, 0, 9]))

    return RT
