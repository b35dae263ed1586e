from . import vocabulary
