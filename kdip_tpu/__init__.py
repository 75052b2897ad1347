"""kdip_tpu — TPU-native framework for diffusion-based inverse problems.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`xypeng9903/k-diffusion-inverse-problems` (ICML 2024: "Improving Diffusion
Models for Inverse Problems Using Optimal Posterior Covariance"):
zero-shot posterior sampling for noisy linear inverse problems (inpainting,
deblurring, super-resolution) with principled posterior covariance, unified
guidance (Type I/II, DPS, PiGDM, DiffPIR, TMPD, STSL), Karras samplers, and
the ADM/k-diffusion model families — designed TPU-first: scanned samplers,
vjp-based guidance, FFT operators in XLA, and mesh sharding for scale-out.
"""

from . import (autoi, brownian, ckpt, config, data, ddpm_sampling,  # noqa: F401
               diffusion, evaluation, gns, guidance, logger, metrics,
               operators, precond, profiling, resample, samplers,
               sampling_api, schedules, script_util, tfevents, train,
               train_loop, utils)
from . import models, ops, parallel  # noqa: F401

__version__ = "0.1.0"
