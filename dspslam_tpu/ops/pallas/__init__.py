from . import decoder_kernel, fast_kernel
