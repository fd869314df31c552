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

    def random_positions(self, key, N: int):
        """N stratified-uniform positions on the disc (traceable)."""
        import jax.numpy as jnp
        x, y = sampling.stratified_ring_sampling(key, N, 0.0, self.r)
        return jnp.stack([x + self.pos[0], y + self.pos[1],
                          jnp.full_like(x, self.pos[2])], axis=-1)
