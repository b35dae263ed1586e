from . import decoder_kernel
