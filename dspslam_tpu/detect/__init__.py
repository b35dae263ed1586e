from . import offline, synthetic
