from . import grid, spectral, interp, nufft
from .grid import SpectralGrid

__all__ = ["grid", "spectral", "interp", "nufft", "SpectralGrid"]
