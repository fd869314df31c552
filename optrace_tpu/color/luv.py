"""CIELUV conversions (CIE 1976 L*u*v*) and u'v' chromaticity helpers.

Parity with reference ``optrace/tracer/color/luv.py`` using the
"actual CIE standard" constants k=903.3, e=0.008856 (Lindbloom). All
functions are branchless jnp over (..., 3) arrays.
"""

import jax.numpy as jnp

from .xyz import WP_D65_XYZ

WP_D65_LUV = [100.0, 0.19783982, 0.4683363]
"""D65 whitepoint as (L, u', v'), computed from the XYZ whitepoint."""

WP_D65_UV = WP_D65_LUV[1:]

# sRGB primaries in u'v' (standard chromaticities transformed to CIE 1976 UCS)
SRGB_R_UV = [0.4507042254, 0.5228873239]
SRGB_G_UV = [0.125, 0.5625]
SRGB_B_UV = [0.1754385965, 0.1578947368]

_K = 903.3
_E = 0.008856


def xyz_to_luv(xyz: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """XYZ → CIELUV. ``normalize``: scale by the max Y in the input instead of
    the D65 whitepoint Y (reference luv.py:20-71 semantics: Y=0 → (0,0,0))."""
    xyz = jnp.clip(jnp.asarray(xyz), 0.0, None)
    X, Y, Z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    un, vn = WP_D65_UV

    if normalize:
        Yn = jnp.maximum(jnp.nanmax(Y), 1e-30)
    else:
        Yn = WP_D65_XYZ[1]

    t = Y / Yn
    L = jnp.where(t > _E, 116.0 * jnp.cbrt(t) - 16.0, _K * t)

    denom = X + 15.0 * Y + 3.0 * Z
    D = jnp.where(denom > 0, 1.0 / jnp.where(denom > 0, denom, 1.0), 0.0)
    u = 4.0 * X * D
    v = 9.0 * Y * D

    valid = Y > 0
    L = jnp.where(valid, L, 0.0)
    L13 = 13.0 * L
    uu = jnp.where(valid, L13 * (u - un), 0.0)
    vv = jnp.where(valid, L13 * (v - vn), 0.0)
    return jnp.stack([L, uu, vv], axis=-1)


def luv_to_xyz(luv: jnp.ndarray) -> jnp.ndarray:
    """CIELUV → XYZ (inverse of above, reference luv.py:74-107)."""
    luv = jnp.asarray(luv)
    L, u, v = luv[..., 0], luv[..., 1], luv[..., 2]
    un, vn = WP_D65_UV

    valid = L > 0
    Y = jnp.where(L > _K * _E, ((L + 16.0) / 116.0) ** 3, L / _K)
    L13 = 13.0 * L
    dv = v + L13 * vn
    dv = jnp.where(dv != 0, dv, 1.0)
    X = 9.0 / 4.0 * Y * (u + L13 * un) / dv
    Z = 3.0 * Y * (L13 / dv - 5.0 / 3.0) - X / 3.0

    zero = jnp.zeros_like(Y)
    return jnp.stack([jnp.where(valid, X, zero),
                      jnp.where(valid, Y, zero),
                      jnp.where(valid, Z, zero)], axis=-1)


def luv_to_u_v_l(luv: jnp.ndarray) -> jnp.ndarray:
    """CIELUV → (u', v', L). L=0 rows get whitepoint chromaticity
    (reference luv.py:110-127)."""
    luv = jnp.asarray(luv)
    L = luv[..., 0]
    un, vn = WP_D65_UV
    valid = L > 0
    Ls = jnp.where(valid, L, 1.0)
    u_ = jnp.where(valid, un + luv[..., 1] / (13.0 * Ls), un)
    v_ = jnp.where(valid, vn + luv[..., 2] / (13.0 * Ls), vn)
    return jnp.stack([u_, v_, L], axis=-1)


def luv_chroma(luv: jnp.ndarray) -> jnp.ndarray:
    """CIELUV chroma C* = √(u*² + v*²)."""
    luv = jnp.asarray(luv)
    return jnp.sqrt(luv[..., 1] ** 2 + luv[..., 2] ** 2)


def luv_saturation(luv: jnp.ndarray) -> jnp.ndarray:
    """CIELUV saturation s = C*/L (0 where L=0)."""
    luv = jnp.asarray(luv)
    L = luv[..., 0]
    C = luv_chroma(luv)
    return jnp.where(L > 0, C / jnp.where(L > 0, L, 1.0), 0.0)


def luv_hue(luv: jnp.ndarray) -> jnp.ndarray:
    """CIELUV hue angle in degrees [0, 360)."""
    luv = jnp.asarray(luv)
    hue = jnp.degrees(jnp.arctan2(luv[..., 2], luv[..., 1]))
    return jnp.where(hue < 0, hue + 360.0, hue)
