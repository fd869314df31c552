"""CIE standard illuminant spectral power distributions.

Data: CIE Colorimetry 3rd ed. (2004) tables plus the CIE LED illuminant set
(DOI:10.25039/CIE.DS.vgssnyfg), stored in ``resources/cie_data.npz``.
Parity with reference ``optrace/tracer/color/illuminants.py``: linear
interpolation of the 5 nm tables, zero outside each illuminant's support.
"""

import pathlib

import numpy as np
import jax.numpy as jnp

_RES = pathlib.Path(__file__).resolve().parent.parent / "resources" / "cie_data.npz"

with np.load(_RES, allow_pickle=False) as _d:
    _ILL_WL = np.asarray(_d["illuminant_wl"], dtype=np.float32)
    _ILL_NAMES = [str(n) for n in _d["illuminant_names"]]
    _ILL_SPDS = np.asarray(_d["illuminant_spds"], dtype=np.float32)

ILLUMINANT_NAMES = list(_ILL_NAMES)


def illuminant(name: str, wl) -> jnp.ndarray:
    """Evaluate standard illuminant ``name`` at wavelengths ``wl`` (nm).
    Host inputs evaluate in numpy (ops/xp.py)."""
    from ..ops.xp import get_xp
    xp = get_xp(wl)
    if name == "E":
        return xp.full_like(xp.asarray(wl, dtype=xp.float32), 100.0)
    if name not in _ILL_NAMES:
        raise ValueError(f"Unknown illuminant '{name}'. Available: {ILLUMINANT_NAMES + ['E']}")
    idx = _ILL_NAMES.index(name)
    spd = _ILL_SPDS[idx]
    valid = np.isfinite(spd)
    return xp.interp(xp.asarray(wl), xp.asarray(_ILL_WL[valid]),
                     xp.asarray(spd[valid]), left=0.0, right=0.0)


def _make_named(name):
    def fn(wl):
        return illuminant(name, wl)
    fn.__name__ = f"{name.lower().replace('-', '_')}_illuminant"
    fn.__doc__ = f"Standard illuminant {name} SPD at wavelengths wl (nm)."
    return fn


# named convenience functions matching the reference color API
a_illuminant = _make_named("A")
c_illuminant = _make_named("C")
e_illuminant = _make_named("E")
d50_illuminant = _make_named("D50")
d55_illuminant = _make_named("D55")
d65_illuminant = _make_named("D65")
d75_illuminant = _make_named("D75")
f2_illuminant = _make_named("F2")
f7_illuminant = _make_named("F7")
f11_illuminant = _make_named("F11")
led_b1_illuminant = _make_named("LED-B1")
led_b2_illuminant = _make_named("LED-B2")
led_b3_illuminant = _make_named("LED-B3")
led_b4_illuminant = _make_named("LED-B4")
led_b5_illuminant = _make_named("LED-B5")
led_bh1_illuminant = _make_named("LED-BH1")
led_rgb1_illuminant = _make_named("LED-RGB1")
led_v1_illuminant = _make_named("LED-V1")
led_v2_illuminant = _make_named("LED-V2")
