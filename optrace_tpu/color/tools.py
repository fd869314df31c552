"""Wavelength grids and Planck blackbody radiators.

Parity with reference ``optrace/tracer/color/tools.py:7-59``.
"""

import numpy as np
import jax.numpy as jnp
import scipy.constants

from ..utils.global_options import global_options

WL_MIN0: float = 380.0   #: lower bound of the visible range used for color features
WL_MAX0: float = 780.0   #: upper bound of the visible range used for color features


def wavelengths(N: int) -> np.ndarray:
    """N equally spaced wavelengths spanning ``global_options.wavelength_range``.
    Returned as a host numpy array: inside jit it becomes a compile-time
    constant, outside it avoids device dispatches during scene building."""
    lo, hi = global_options.wavelength_range
    return np.linspace(lo, hi, N)


def blackbody(wl, T: float = 6504.0) -> jnp.ndarray:
    """Planck spectral radiance for wavelengths ``wl`` (nm) at temperature T (K).

    Same physics as reference tools.py: spectral radiance in W/(sr m³).
    """
    c = scipy.constants.c
    h = scipy.constants.h
    k_B = scipy.constants.k
    wl_m = jnp.asarray(wl) * 1e-9
    return 2.0 * h * c ** 2 / wl_m ** 5 / (jnp.exp(h * c / (wl_m * k_B * T)) - 1.0)


def normalized_blackbody(wl, T: float = 6504.0) -> jnp.ndarray:
    """Blackbody curve normalized to peak 1 within the visible range."""
    vals = blackbody(wl, T)
    ref = blackbody(wavelengths(2000), T)
    return vals / jnp.max(ref)
