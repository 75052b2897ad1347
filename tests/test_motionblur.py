"""Motion-blur kernel synthesis: per-seed bit-exactness vs the reference
motionblur.Kernel (VERDICT r1 missing #4).

Our generator draws the same distributions in the same order as the
reference's global-RNG draws, so seeding the global RNG for the reference
and passing the same seed to ours must give identical kernels.
"""

import numpy as np
import pytest

from kdip_tpu.ops import kernels as okernels


@pytest.mark.parametrize("seed,intensity", [(0, 0.0), (1, 0.5), (2, 1.0),
                                            (3, 0.5), (7, 0.25)])
def test_motion_blur_kernel_matches_reference_per_seed(reference_path, seed,
                                                       intensity):
    from motionblur.motionblur import Kernel

    np.random.seed(seed)
    ref = Kernel(size=(61, 61), intensity=intensity).kernelMatrix
    ours = okernels.motion_blur_kernel(61, intensity, seed=seed)
    np.testing.assert_array_equal(ours, ref.astype(np.float32))


def test_motion_blur_kernel_properties():
    k = okernels.motion_blur_kernel(61, 0.5, seed=11)
    assert k.shape == (61, 61)
    assert np.isfinite(k).all() and (k >= 0).all()
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-5)
