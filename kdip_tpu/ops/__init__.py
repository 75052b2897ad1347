from . import (deblur, fft, image_utils, inpaint, kernels,  # noqa: F401
               resize)
