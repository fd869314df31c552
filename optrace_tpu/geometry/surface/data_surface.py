"""Surfaces defined by measured/sampled height data
(reference data_surface_2d.py / data_surface_1d.py).

The reference evaluates an order-4 scipy spline everywhere. Splines are not
jit-friendly, so the TPU design is two-stage: the same order-4 spline is
built host-side (f64), then *resampled to a dense regular grid* together
with its partial derivatives; inside traced code sag and normals are
bilinear interpolations of those dense grids. With the default 4×
refinement the resampling error is far below C_EPS for any data surface
that satisfies the reference's own ≥50/≥200-points-per-dim rules.
"""

from typing import Any

import numpy as np
import jax.numpy as jnp
import scipy.interpolate

from .surface import Surface
from ...ops import geom
from ...utils.property_checker import PropertyChecker as pc
from ...utils.warnings import warning

_REFINE = 4
_MAX_DENSE = 2001


def _bilinear(grid, x0, dx, q_x, q_y):
    """Bilinear interpolation of a square grid with origin x0 and step dx."""
    gx = (q_x - x0) / dx
    gy = (q_y - x0) / dx
    n = grid.shape[0]
    ix = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, n - 2)
    iy = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, n - 2)
    fx = jnp.clip(gx - ix, 0.0, 1.0)
    fy = jnp.clip(gy - iy, 0.0, 1.0)
    g00 = grid[iy, ix]
    g01 = grid[iy, ix + 1]
    g10 = grid[iy + 1, ix]
    g11 = grid[iy + 1, ix + 1]
    return (g00 * (1 - fx) * (1 - fy) + g01 * fx * (1 - fy)
            + g10 * (1 - fx) * fy + g11 * fx * fy)


class DataSurface2D(Surface):

    rotational_symmetry: bool = False

    def __init__(self, r: float, data, parax_roc: float = None, **kwargs) -> None:
        self._lock = False
        super().__init__(r, **kwargs)

        self._sign = 1.0
        self._angle = 0.0
        self.parax_roc = parax_roc

        pc.check_type("data", data, (np.ndarray, list))
        Z = np.asarray(data, dtype=np.float64)
        pc.check_finite("data", Z)

        nx = Z.shape[0]
        if nx < 50:
            raise ValueError("For a good surface representation 'data' should have "
                             "at least 50 values per dimension")
        if nx < 200:
            warning(f"{type(self).__name__}: At least 200 values per dimension are advised "
                    f"for a 'data' matrix, but got {nx}.")
        if Z.ndim != 2 or Z.shape[0] != Z.shape[1]:
            raise ValueError("data needs to be a square 2D matrix.")

        xy = np.linspace(-r, r, nx)
        self._spline = scipy.interpolate.RectBivariateSpline(xy, xy, Z.T, kx=4, ky=4)

        # center offset removal (reference data_surface_2d.py: surface center at z=0)
        self._offset = float(self._spline(0.0, 0.0)[0, 0])

        # dense grids for the traced path
        nd = min(_REFINE * nx, _MAX_DENSE)
        xg = np.linspace(-r, r, nd)
        self._dense_x0 = float(xg[0])
        self._dense_dx = float(xg[1] - xg[0])
        self._dense_z = (self._spline(xg, xg).T - self._offset)
        self._dense_gx = self._spline(xg, xg, dx=1).T
        self._dense_gy = self._spline(xg, xg, dy=1).T

        self.z_min, self.z_max = self._find_bounds()
        self.z_min += self.pos[2]
        self.z_max += self.pos[2]
        self.lock()

    # ------------------------------------------------------------------
    def _rot_rel(self, x, y):
        if self._angle:
            c, s = np.cos(-self._angle), np.sin(-self._angle)
            x, y = x * c - y * s, x * s + y * c
        if self._sign < 0:
            x = -x
        return x, y

    def _sag(self, x, y):
        xr, yr = self._rot_rel(x, y)
        z = _bilinear(jnp.asarray(self._dense_z), self._dense_x0, self._dense_dx, xr, yr)
        return self._sign * z

    def _normals_rel(self, x, y):
        xr, yr = self._rot_rel(x, y)
        dx = _bilinear(jnp.asarray(self._dense_gx), self._dense_x0, self._dense_dx, xr, yr) * self._sign
        dy = _bilinear(jnp.asarray(self._dense_gy), self._dense_x0, self._dense_dx, xr, yr) * self._sign
        if self._sign < 0:
            dx = -dx
        if self._angle:
            c, s = np.cos(self._angle), np.sin(self._angle)
            dx, dy = dx * c - dy * s, dx * s + dy * c
        n = jnp.stack([-dx, -dy, jnp.ones_like(dx)], axis=-1)
        return n / jnp.linalg.norm(n, axis=-1, keepdims=True)

    def _hit_t(self, o, s):
        z0 = self.z_min - self.pos[2]
        z1 = self.z_max - self.pos[2]
        return geom.hit_newton(self._sag, o, s, z0, z1)

    # ------------------------------------------------------------------
    def flip(self) -> None:
        self._lock = False
        self._sign *= -1.0
        if self.parax_roc is not None:
            self.parax_roc *= -1
        a = self.pos[2] - (self.z_max - self.pos[2])
        b = self.pos[2] + (self.pos[2] - self.z_min)
        self.z_min, self.z_max = a, b
        self.lock()

    def rotate(self, angle: float) -> None:
        self._lock = False
        self._angle += np.deg2rad(angle)
        self.lock()

    def __setattr__(self, key: str, val: Any) -> None:
        super().__setattr__(key, val)


class DataSurface1D(DataSurface2D):
    """Radial height profile, mirrored to 2D (reference data_surface_1d.py)."""

    rotational_symmetry: bool = True

    def __init__(self, r: float, data, parax_roc: float = None, **kwargs) -> None:
        pc.check_type("data", data, (np.ndarray, list))
        prof = np.asarray(data, dtype=np.float64)
        pc.check_finite("data", prof)
        if prof.ndim != 1:
            raise ValueError("data needs to be a 1D array for DataSurface1D.")
        n = prof.shape[0]
        if n < 50:
            raise ValueError("For a good surface representation 'data' should have at least 50 values")

        # build a 2D grid by rotating the radial profile
        rr = np.linspace(0, r, n)
        spline1d = scipy.interpolate.InterpolatedUnivariateSpline(rr, prof, k=4)
        xy = np.linspace(-r, r, 2 * n - 1)
        X, Y = np.meshgrid(xy, xy)
        R = np.clip(np.hypot(X, Y), 0, r)
        Z = spline1d(R)
        super().__init__(r, Z, parax_roc=parax_roc, **kwargs)
