from . import (deblur, dps_tools, fft, image_utils, inpaint,  # noqa: F401
               kernels, resize, tiling, transforms)
