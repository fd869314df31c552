"""Trace engine (reference optrace/tracer/raytracer.py + ray_storage.py,
SURVEY.md §2.6): scene compilation to pure jnp step functions, the unrolled
surface-sequential trace, ray storage, and the Raytracer orchestrator."""

from .ray_storage import RayStorage  # noqa: F401
from .raytracer import Raytracer  # noqa: F401
