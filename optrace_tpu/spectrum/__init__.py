"""Spectra and dispersive media (reference optrace/tracer/spectrum/ and
refraction_index.py, SURVEY.md §2.3)."""

from .spectrum import Spectrum  # noqa: F401
from .light_spectrum import LightSpectrum  # noqa: F401
from .transmission_spectrum import TransmissionSpectrum  # noqa: F401
from .refraction_index import RefractionIndex  # noqa: F401
