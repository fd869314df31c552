"""I/O: ZEMAX .agf glass catalogs and .zmx geometries
(reference optrace/tracer/load.py, SURVEY.md §2.8)."""

from .load import load_agf, load_zmx  # noqa: F401
