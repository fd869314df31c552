"""Paraxial ray-transfer-matrix (ABCD) analysis.

Behavioral parity with reference
``optrace/tracer/transfer_matrix_analysis.py``: per-surface refraction
matrices, thickness/gap matrices, ideal-lens matrices; cardinal points
(vertex/principal/nodal/focal), efl/bfl/ffl, optical powers incl. the
"_n" ophthalmic variants, optical center; object↔image positions and
magnifications; entrance/exit pupils around a stop.

Pure 2×2 host-side linear algebra — never traced.
"""

import numpy as np

from ..spectrum.refraction_index import RefractionIndex
from ..utils.base_class import BaseClass
from ..utils.property_checker import PropertyChecker as pc
from ..utils.global_options import global_options as go


class TMA(BaseClass):

    def __init__(self, lenses: list, wl: float = 555., n0: RefractionIndex = None,
                 **kwargs) -> None:
        pc.check_type("lenses", lenses, list)
        if n0 is not None:
            pc.check_type("n0", n0, RefractionIndex)
        pc.check_type("wl", wl, (float, int))
        pc.check_not_below("wl", wl, go.wavelength_range[0])
        pc.check_not_above("wl", wl, go.wavelength_range[1])

        self.wl = float(wl)

        L = sorted(lenses, key=lambda el: el.front.pos[2])
        self.vertex_points = (float(L[0].front.pos[2]), float(L[-1].back.pos[2])) \
            if len(lenses) else (float("nan"), float("nan"))

        self.n1 = float(n0(np.array([self.wl]))[0]) if n0 is not None else 1.0
        self.n2 = float(L[-1].n2(np.array([self.wl]))[0]) \
            if len(lenses) and L[-1].n2 is not None else self.n1

        _1, _2 = self._1, self._2 = self.vertex_points
        self._ds = []
        self._mats = []
        self.abcd = self._gen_abcd(L)

        n1_, n2_ = self.n1, self.n2
        A, B, C, D = (float(v) for v in self.abcd.ravel())

        self.principal_points = (_1 - (n1_ - n2_ * D) / (n2_ * C), _2 + (1 - A) / C) if C \
            else (float("nan"), float("nan"))
        p1, p2 = self.principal_points
        self.nodal_points = (_1 - (1 - D) / C, _2 + (n1_ - n2_ * A) / (n2_ * C)) if C \
            else (float("nan"), float("nan"))
        self.focal_points = (p1 + n1_ / n2_ / C, p2 - 1 / C) if C \
            else (float("nan"), float("nan"))
        f1p, f2p = self.focal_points
        self.focal_lengths = (f1p - p1, f2p - p2) if C else (float("nan"), float("nan"))
        f1, f2 = self.focal_lengths

        self.ffl = f1p - _1 if C else float("nan")
        self.bfl = f2p - _2 if C else float("nan")
        self.d = self._2 - self._1
        self.efl = f2
        self.efl_n = f2 / self.n2
        self.focal_lengths_n = (f1 / self.n1, f2 / self.n2)
        self.powers = (1000 / f1, 1000 / f2)
        self.powers_n = (1000 * self.n1 / f1, 1000 * self.n2 / f2)

        _oc = 1 - A + B * C / (D - 1) if D - 1 else float(np.inf)
        self.optical_center = _1 + self.d / _oc \
            if _oc and not np.isnan(_oc) and C != 0 else float(np.nan)

        super().__init__(**kwargs)
        self.lock()
        self._new_lock = True

    # ------------------------------------------------------------------
    def _n_of(self, n, default):
        if n is None:
            return default
        return float(n(np.array([self.wl]))[0])

    def _gen_abcd(self, L: list) -> np.ndarray:
        dz = 0
        for i in range(len(L)):
            if i + 1 < len(L) and (not np.isclose(L[i].pos[0], L[i + 1].pos[0])
                                   or not np.isclose(L[i].pos[1], L[i + 1].pos[1])):
                raise RuntimeError("Lenses don't share one axis.")

            n1_ = self._n_of(L[i - 1].n2, self.n1) if i else self.n1
            n2_ = self._n_of(L[i].n2, self.n1)

            if L[i].is_ideal:
                z0 = self._ds[-1] if self._ds else 0
                self._ds += [z0]
                self._mats += [np.array([[1, 0], [-L[i].D / 1000, n1_ / n2_]])]
            else:
                if L[i].front.parax_roc is None or L[i].back.parax_roc is None:
                    raise RuntimeError("Lens without rotational symmetry in transfer matrix analysis.")
                n_ = self._n_of(L[i].n, self.n1)
                R2 = L[i].front.parax_roc
                R1 = L[i].back.parax_roc
                front = np.array([[1, 0], [-(n_ - n1_) / R2 / n_, n1_ / n_]])
                thickness = np.array([[1, L[i].d], [0, 1]])
                back = np.array([[1, 0], [-(n2_ - n_) / R1 / n2_, n_ / n2_]])
                z0 = self._ds[-1] if self._ds else 0
                self._ds += [z0, z0 + L[i].d, z0 + L[i].d]
                self._mats += [front, thickness, back]

            if i + 1 < len(L):
                dz = L[i + 1].front.pos[2] - L[i].back.pos[2]
                self._ds += [self._ds[-1] + dz]
                self._mats += [np.array([[1, dz], [0, 1]])]
                if dz < 0:
                    raise RuntimeError("Negative distance between lenses. Are there object collisions?")

        mat = np.eye(2)
        n = len(self._mats)
        for i in range(n):
            mat = mat @ self._mats[n - i - 1]
        return mat

    # ------------------------------------------------------------------
    @staticmethod
    def _obj_dist(abcd: np.ndarray, z1: float, rev: bool = False) -> float:
        if rev:
            abcd = np.linalg.inv(abcd)
            z1 *= -1
        A, B, C, D = abcd.ravel()
        if np.isfinite(z1):
            z2 = -(B + z1 * A) / (D + C * z1) if D + C * z1 else np.nan
        else:
            z2 = -A / C if C else np.nan
        return z2 if not rev else -z2

    @staticmethod
    def _dist_mat(abcd: np.ndarray, g: float, b: float) -> np.ndarray:
        return np.array([[1, b], [0, 1]]) @ abcd @ np.array([[1, g], [0, 1]])

    def matrix_at(self, z_g: float, z_b: float) -> np.ndarray:
        """ABCD matrix from object plane z_g to image plane z_b."""
        return self._dist_mat(self.abcd, self._1 - z_g, z_b - self._2)

    # ------------------------------------------------------------------
    def image_position(self, z_g) -> float:
        """Absolute image z-position for an object at z_g."""
        if self._1 < z_g < self._2:
            raise ValueError(f"Object inside lens with z-extent at optical axis of {self.vertex_points}")
        g = self._1 - z_g
        b = self._obj_dist(self.abcd, g, rev=False)
        return float(b + self._2)

    def image_magnification(self, z_g) -> float:
        """Transverse magnification at the image plane for object at z_g."""
        with np.errstate(invalid="ignore"):
            z_b = self.image_position(z_g)
            return float(self.matrix_at(z_g, z_b)[0, 0])

    def object_position(self, z_b) -> float:
        """Absolute object z-position for an image at z_b."""
        if self._1 < z_b < self._2:
            raise ValueError(f"Image inside lens with z-extent at optical axis of {self.vertex_points}")
        b = z_b - self._2
        g = self._obj_dist(self.abcd, b, rev=True)
        return float(self._1 - g)

    def object_magnification(self, z_b) -> float:
        """Magnification for a given image position."""
        with np.errstate(invalid="ignore"):
            z_g = self.object_position(z_b)
            return float(self.matrix_at(z_g, z_b)[0, 0])

    # ------------------------------------------------------------------
    def _pupil_props(self, zp: float):
        """Pupil positions and magnifications for a stop at zp
        (front/rear group matrices around the stop, reference :218-289)."""
        i = 0
        while i < len(self._ds) and self._ds[i] + self._1 < zp:
            i += 1

        if i:
            lmat = np.eye(2)
            for j in range(i):
                lmat = lmat @ self._mats[i - j - 1]
            lmat = np.linalg.inv(lmat)
            lz = self._ds[i - 1] + self._1
            ze1 = self._1 + self._obj_dist(lmat, lz - zp)
            m1 = self._dist_mat(lmat, lz - zp, ze1 - self._1)[0, 0]
        else:
            ze1 = zp
            m1 = 1

        k = len(self._mats)
        l = k - i
        if l:
            off = 1 if i + 1 < k and self._ds[i] == self._ds[i + 1] else 0
            rmat = np.eye(2)
            for m in range(l - off):
                rmat = rmat @ self._mats[k - m - 1]
            rz = self._ds[i + off] + self._1
            ze2 = self._2 + self._obj_dist(rmat, rz - zp)
            m2 = self._dist_mat(rmat, rz - zp, ze2 - self._2)[0, 0]
        else:
            ze2 = zp
            m2 = 1
        return float(ze1), float(ze2), float(m1), float(m2)

    def pupil_position(self, z_s: float):
        """(entrance, exit) pupil z-positions for a stop at z_s."""
        return self._pupil_props(z_s)[:2]

    def pupil_magnification(self, z_s: float):
        """(entrance, exit) pupil magnifications for a stop at z_s."""
        return self._pupil_props(z_s)[2:]
