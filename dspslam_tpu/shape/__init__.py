from . import gn, losses, mesh
