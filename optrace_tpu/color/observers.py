"""CIE 1931 2° standard observer colour-matching functions.

Data: CIE 2018 1 nm tables (DOI:10.25039/CIE.DS.xvudnb9b), stored in
``resources/cie_data.npz`` (see tools/make_cie_data.py). Parity with
reference ``optrace/tracer/color/observers.py:10-42`` (linear interpolation,
zero outside the tabulated range).
"""

import pathlib

import numpy as np
import jax.numpy as jnp

_RES = pathlib.Path(__file__).resolve().parent.parent / "resources" / "cie_data.npz"

with np.load(_RES, allow_pickle=False) as _d:
    _OBS_WL = np.asarray(_d["observer_wl"], dtype=np.float32)      # (n,)
    _OBS_XYZ = np.asarray(_d["observer_xyz"], dtype=np.float32)    # (3, n)


def observers():
    """Return (wl, xbar, ybar, zbar) raw 1 nm observer tables as numpy."""
    return _OBS_WL, _OBS_XYZ[0], _OBS_XYZ[1], _OBS_XYZ[2]


def _interp(wl, row: int):
    wl = jnp.asarray(wl)
    return jnp.interp(wl, jnp.asarray(_OBS_WL), jnp.asarray(_OBS_XYZ[row]),
                      left=0.0, right=0.0)


def x_observer(wl) -> jnp.ndarray:
    """CIE 1931 x̄(λ), linearly interpolated; zero outside the table."""
    return _interp(wl, 0)


def y_observer(wl) -> jnp.ndarray:
    """CIE 1931 ȳ(λ)."""
    return _interp(wl, 1)


def z_observer(wl) -> jnp.ndarray:
    """CIE 1931 z̄(λ)."""
    return _interp(wl, 2)
