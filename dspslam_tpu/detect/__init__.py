from . import maskrcnn, offline, pointpillars, synthetic
