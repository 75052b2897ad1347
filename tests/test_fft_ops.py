"""Classical-degradation / pixel-shift / DPS-gradient helpers
(ref: utils_sisr.py:99-143, utils_model.py:202-205, 390-395)."""

import numpy as np


def test_classical_degradation_matches_scipy():
    from scipy import ndimage

    from kdip_tpu.ops import fft as kfft

    rng = np.random.RandomState(0)
    for ks in (7, 8):
        x = rng.rand(16, 16, 3)
        k = rng.rand(ks, ks)
        k /= k.sum()
        want = ndimage.convolve(x, np.expand_dims(k, 2),
                                mode="wrap")[0::3, 0::3]
        got = np.asarray(kfft.classical_degradation(x, k, 3))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_shift_pixel_bilinear():
    from kdip_tpu.ops import fft as kfft

    rng = np.random.RandomState(1)
    x = rng.rand(10, 12)
    out = kfft.shift_pixel(x.copy(), 2)
    # +0.5 bilinear shift == 2x2 block average away from the clip border
    want = 0.25 * (x[:-1, :-1] + x[1:, :-1] + x[:-1, 1:] + x[1:, 1:])
    np.testing.assert_allclose(out[:-1, :-1], want, atol=1e-12)
    # channel version
    x3 = rng.rand(6, 6, 3)
    out3 = kfft.shift_pixel(x3.copy(), 2)
    for c in range(3):
        np.testing.assert_allclose(out3[..., c],
                                   kfft.shift_pixel(x3[..., c].copy(), 2),
                                   atol=1e-12)


def test_find_nearest_and_grad_and_value():
    import jax
    from kdip_tpu.ops import dps_tools as dt

    assert dt.find_nearest([0.0, 1.0, 2.5], 2.2) == 2

    def op(x):
        return x[:, ::2, ::2, :]

    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 3))
    y = op(x) + 0.1
    grad, norm = dt.grad_and_value(op, lambda z: z * 2.0, x, y)
    assert grad.shape == x.shape
    assert np.isfinite(float(norm)) and np.isfinite(np.asarray(grad)).all()
