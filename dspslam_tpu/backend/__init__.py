from . import ba
