"""Dispersive refractive index models.

Behavioral parity with reference ``optrace/tracer/refraction_index.py``:
18 model types (Cauchy, Conrady, Constant, Data, Abbe estimate, Sellmeier
1-5, Herzberger, Schott, Extended/2/3, Handbook of Optics 1/2, Function),
n ≥ 1 enforcement, Abbe number utilities.

The evaluation core :func:`eval_dispersion` is a pure jnp function of
(model, coefficients, wavelength) so the scene compiler can trace and
differentiate through material coefficients.
"""

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from .spectrum import Spectrum
from .. import color
from ..utils.property_checker import PropertyChecker as pc

# default Abbe lines F, d, C (same values as presets.spectral_lines.FdC,
# duplicated here to avoid a circular import through the presets package)
_FdC_LINES = [486.1327, 587.5618, 656.272]


COEFF_COUNT = {"Cauchy": 4, "Conrady": 3, "Sellmeier1": 6, "Sellmeier2": 5, "Sellmeier3": 8,
               "Sellmeier4": 5, "Sellmeier5": 10, "Herzberger": 6, "Extended": 8, "Extended2": 8,
               "Handbook of Optics 1": 4, "Handbook of Optics 2": 4, "Schott": 6, "Extended3": 9}
"""number of coefficients per dispersion model"""


def _is_device(*vals) -> bool:
    """True when any input is a jax array/tracer — then evaluation must
    stay in jnp (traceable/differentiable). Plain numpy/python inputs are
    evaluated with host numpy in f64: scene building, catalog loading and
    TMA make thousands of tiny index evaluations, and device dispatches
    through the remote-TPU tunnel (~20 ms each, plus one XLA compile per
    distinct shape) would dominate the wall time (measured 326 s for the
    benchmark microscope build before this split; ~5 s after)."""
    return any(isinstance(v, (jax.Array, jax.core.Tracer)) for v in vals)


def eval_dispersion(n_type: str, coeff, wl) -> jnp.ndarray:
    """Evaluate a coefficient-based dispersion model at wavelengths wl (nm).

    ``coeff`` may be a traced array for gradients w.r.t. material
    parameters; with host inputs the evaluation runs in numpy f64 (see
    :func:`_is_device`). Formula set follows the standard
    optical-glass-catalog models (same family the reference implements,
    refraction_index.py:62-169).
    """
    c_list = [coeff[i] for i in range(COEFF_COUNT[n_type])] if not isinstance(coeff, (list, tuple)) else list(coeff)
    xp = jnp if _is_device(wl, *c_list) else np
    wl_ = xp.asarray(wl)
    c = c_list
    l2 = (wl_ * 1e-3) ** 2    # λ² in µm²

    if n_type == "Conrady":
        l = wl_ * 1e-3
        return c[0] + c[1] / l + c[2] / l ** 3.5
    if n_type == "Cauchy":
        return c[0] + c[1] / l2 + c[2] / l2 ** 2 + c[3] / l2 ** 3
    if n_type == "Sellmeier1":
        return xp.sqrt(1 + c[0] * l2 / (l2 - c[1]) + c[2] * l2 / (l2 - c[3]) + c[4] * l2 / (l2 - c[5]))
    if n_type == "Sellmeier2":
        return xp.sqrt(1 + c[0] + c[1] * l2 / (l2 - c[2] ** 2) + c[3] / (l2 - c[4] ** 2))
    if n_type == "Sellmeier3":
        return xp.sqrt(1 + c[0] * l2 / (l2 - c[1]) + c[2] * l2 / (l2 - c[3])
                        + c[4] * l2 / (l2 - c[5]) + c[6] * l2 / (l2 - c[7]))
    if n_type == "Sellmeier4":
        return xp.sqrt(c[0] + c[1] * l2 / (l2 - c[2]) + c[3] * l2 / (l2 - c[4]))
    if n_type == "Sellmeier5":
        return xp.sqrt(1 + c[0] * l2 / (l2 - c[1]) + c[2] * l2 / (l2 - c[3]) + c[4] * l2 / (l2 - c[5])
                        + c[6] * l2 / (l2 - c[7]) + c[8] * l2 / (l2 - c[9]))
    if n_type == "Schott":
        return xp.sqrt(c[0] + c[1] * l2 + c[2] / l2 + c[3] / l2 ** 2 + c[4] / l2 ** 3 + c[5] / l2 ** 4)
    if n_type == "Herzberger":
        L = 1 / (l2 - 0.028)
        return c[0] + c[1] * L + c[2] * L ** 2 + c[3] * l2 + c[4] * l2 ** 2 + c[5] * l2 ** 3
    if n_type == "Handbook of Optics 1":
        return xp.sqrt(c[0] + c[1] / (l2 - c[2]) - c[3] * l2)
    if n_type == "Handbook of Optics 2":
        return xp.sqrt(c[0] + c[1] * l2 / (l2 - c[2]) - c[3] * l2)
    if n_type == "Extended":
        return xp.sqrt(c[0] + c[1] * l2 + c[2] / l2 + c[3] / l2 ** 2 + c[4] / l2 ** 3
                        + c[5] / l2 ** 4 + c[6] / l2 ** 5 + c[7] / l2 ** 6)
    if n_type == "Extended2":
        return xp.sqrt(c[0] + c[1] * l2 + c[2] / l2 + c[3] / l2 ** 2 + c[4] / l2 ** 3
                        + c[5] / l2 ** 4 + c[6] * l2 ** 2 + c[7] * l2 ** 3)
    if n_type == "Extended3":
        return xp.sqrt(c[0] + c[1] * l2 + c[2] * l2 ** 2 + c[3] / l2 + c[4] / l2 ** 2
                        + c[5] / l2 ** 3 + c[6] * l2 ** 4 + c[7] * l2 ** 5 + c[8] / l2 ** 6)
    raise ValueError(f"Unknown dispersion model '{n_type}'.")


def eval_abbe(n_center: float, V: float, lines, wl) -> jnp.ndarray:
    """Estimated index curve from center index and Abbe number V: a
    two-term model n = A + B/(λ²−d), d between Cauchy (0) and Herzberger
    (0.028) (reference refraction_index.py:85-100)."""
    xp = jnp if _is_device(wl, n_center, V) else np
    wl_ = xp.asarray(wl)
    l = 1e-3 * xp.asarray(lines)
    d = 0.014
    l2 = (wl_ * 1e-3) ** 2
    B = (n_center - 1) / V / (1 / (l[0] ** 2 - d) - 1 / (l[2] ** 2 - d))
    A = n_center - B / (l[1] ** 2 - d)
    return A + B / (l2 - d)


class RefractionIndex(Spectrum):

    n_types: list = ["Abbe", "Cauchy", "Conrady", "Constant", "Data", "Extended", "Extended2",
                     "Extended3", "Function", "Handbook of Optics 1", "Handbook of Optics 2",
                     "Sellmeier1", "Sellmeier2", "Sellmeier3", "Sellmeier4",
                     "Sellmeier5", "Herzberger", "Schott"]
    spectrum_types: list = n_types
    coeff_count = COEFF_COUNT

    quantity: str = "Refraction Index n"
    unit: str = ""

    def __init__(self, n_type: str = "Constant", n: float = 1.0, coeff: list = None,
                 lines=None, V: float = None, **kwargs) -> None:
        self.spectrum_type = n_type
        self.coeff = coeff
        self.V = V
        lines = lines if lines is not None else _FdC_LINES
        super().__init__(n_type, val=n, lines=lines, **kwargs)
        self._new_lock = True

    # ------------------------------------------------------------------
    def __call__(self, wl) -> jnp.ndarray:
        """Refractive index at wavelengths wl (nm). Traceable with jax
        inputs; host inputs evaluate in numpy f64 (see _is_device)."""
        on_device = _is_device(wl)
        xp = jnp if on_device else np
        wl_ = xp.asarray(wl)
        st = self.spectrum_type

        if st not in ("Constant", "Data", "Function", "Abbe") and self.coeff is None:
            raise TypeError(f"coefficient variable 'coeff' needs to be provided for n_type='{st}'.")

        if st == "Abbe":
            ns = eval_abbe(self.val, self.V, self.lines, wl_)
        elif st == "Constant":
            ns = xp.broadcast_to(xp.asarray(self.val, wl_.dtype), wl_.shape)
        elif st == "Data":
            if not isinstance(wl_, jax.core.Tracer):
                wlmin, wlmax = float(np.min(np.asarray(wl_))), float(np.max(np.asarray(wl_)))
                if wlmin < self._wls[0] or wlmax > self._wls[-1]:
                    raise RuntimeError(f"Wavelength range [{wlmin:.5g}, {wlmax:.5g}] larger than data "
                                       f"range [{self._wls[0]}, {self._wls[-1]}] for this material.")
            if on_device:
                # clamp instead of extrapolating (outside access already
                # rejected above); uniform wls grid → index-arithmetic interp
                from ..ops.interp import uniform_interp
                v = jnp.asarray(self._vals)
                ns = uniform_interp(wl_, v, float(self._wls[0]),
                                    float(self._wls[1] - self._wls[0]),
                                    left=v[0], right=v[-1])
            else:
                ns = np.interp(wl_, self._wls, self._vals)
        elif st == "Function":
            pc.check_callable("RefractionIndex.func", self.func)
            ns = jnp.asarray(self.func(wl_, **self.func_args))
        else:
            ns = eval_dispersion(st, self.coeff, wl_)

        if not isinstance(ns, jax.core.Tracer):
            flat = np.asarray(ns).ravel()
            wlb = int(np.argmin(flat))
            if flat[wlb] < 1:
                wlf = np.broadcast_to(np.asarray(wl_), flat.shape) if np.asarray(wl_).size else np.asarray(wl_)
                raise RuntimeError(f"Refraction index below 1 with value {flat[wlb]:.4g} "
                                   f"at {np.asarray(wl_).ravel()[wlb % max(np.asarray(wl_).size, 1)]:.4g}nm.")
        return ns

    # ------------------------------------------------------------------
    def abbe_number(self, lines: list = None) -> float:
        """Abbe number V = (n_center − 1)/(n_short − n_long)."""
        lines = lines if lines is not None else self.lines
        n = np.asarray(self(np.asarray(lines, dtype=np.float64)))
        ns, nc, nl = float(n[0]), float(n[1]), float(n[2])
        return float((nc - 1) / (ns - nl)) if ns != nl else float(np.inf)

    def is_dispersive(self) -> bool:
        """Whether the index varies with wavelength (finite Abbe number)."""
        return bool(np.isfinite(self.abbe_number()))

    # ------------------------------------------------------------------
    def __eq__(self, other: Any) -> bool:
        if type(self) is not type(other):
            return False
        if self is other:
            return True
        if self.spectrum_type == "Data" and other.spectrum_type == "Data":
            return (np.array_equal(self._wls, other._wls) and np.array_equal(self._vals, other._vals)
                    and self.quantity == other.quantity and self.unit == other.unit)
        if self.spectrum_type != "Data":
            return self.crepr() == other.crepr()
        return False

    def __ne__(self, other: Any) -> bool:
        return not self.__eq__(other)

    def __hash__(self):
        return id(self)

    # ------------------------------------------------------------------
    def __setattr__(self, key, val) -> None:
        if key == "val":
            pc.check_type(key, val, (int, float))
            pc.check_finite(key, val)
            pc.check_not_below(key, val, 1)
        elif key == "coeff" and val is not None:
            pc.check_type(key, val, list)
            cnt = COEFF_COUNT[self.spectrum_type]
            if len(val) != cnt:
                raise ValueError(f"{key} needs exactly {cnt} coefficients for mode "
                                 f"{self.spectrum_type}, but got {len(val)}.")
            super().__setattr__(key, list(val))
            return
        elif key == "_vals" and val is not None:
            if np.min(val) < 1:
                raise ValueError("all vals values need to be at least 1.")
        elif key == "lines" and isinstance(val, (list, np.ndarray)):
            if len(val) != 3:
                raise ValueError("Property 'lines' for n_type='Abbe' needs exactly 3 elements")
            if not val[0] < val[1] < val[2]:
                raise ValueError("The values of property 'lines' need to be ascending.")
        elif key == "func" and callable(val):
            wls = np.asarray(color.wavelengths(1000))
            n = np.asarray(val(wls, **self.func_args))
            if n.min() < 1:
                raise ValueError("Function func needs to output values >= 1 over the whole visible range.")
        elif key == "V" and val is not None:
            pc.check_type(key, val, (float, int))
            pc.check_above(key, val, 0)
            pc.check_finite(key, val)
        super().__setattr__(key, val)
