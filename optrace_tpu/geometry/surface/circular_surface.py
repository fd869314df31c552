"""Flat disc surface (reference circular_surface.py:7-42)."""

import numpy as np

from .surface import Surface
from ...ops import sampling


class CircularSurface(Surface):

    rotational_symmetry: bool = True

    def __init__(self, r: float, **kwargs) -> None:
        self._lock = False
        super().__init__(r, **kwargs)
        self.parax_roc = np.inf
        self.z_min = self.z_max = self.pos[2]
        self.lock()

    def random_positions(self, key, N: int) -> np.ndarray:
        """N stratified-uniform positions on the disc."""
        x, y = sampling.stratified_ring_sampling(key, N, 0.0, self.r)
        p = np.tile(self.pos, (N, 1))
        p[:, 0] += np.asarray(x)
        p[:, 1] += np.asarray(y)
        return p
