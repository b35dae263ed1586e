from . import evaluation, io, timing
