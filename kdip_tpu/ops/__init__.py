from . import fft, kernels, resize  # noqa: F401
