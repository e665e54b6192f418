from . import sharding, ensemble, multihost
from .sharding import make_mesh, packet_sharding, ensemble_sharding, replicated

__all__ = ["sharding", "ensemble", "multihost", "make_mesh",
           "packet_sharding", "ensemble_sharding", "replicated"]
