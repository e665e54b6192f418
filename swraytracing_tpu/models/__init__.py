from . import analytic, dispersion, fields, qg, rays
from .dispersion import Dispersion

__all__ = ["analytic", "dispersion", "fields", "qg", "rays", "Dispersion"]
