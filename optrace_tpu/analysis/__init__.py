"""Analysis tools: paraxial matrix analysis and PSF convolution
(reference transfer_matrix_analysis.py and convolve.py, SURVEY.md §2.7)."""

from .tma import TMA  # noqa: F401
from .convolve import convolve  # noqa: F401
