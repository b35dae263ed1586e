from . import io, timing
