from . import lie, robust
