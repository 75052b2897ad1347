"""Structural emulation of pywt's wavedec2/coeffs_to_array call chain.

PROVENANCE, honestly stated: the real PyWavelets source cannot be vendored
in this environment (no package installed anywhere on disk, `pip download
PyWavelets` fails — zero network egress; verified 2026-08-18). This module
is therefore written from the *implementation structure* of PyWavelets
(pywt/_multidim.py dwtn/dwt2, pywt/_multilevel.py wavedec2, the
coeffs_to_array packing, and convolution.c's downsampling_convolution) as
recalled from its public source — NOT from the documentation, which is what
the dense-matrix oracle in test_dwt_pywt_layout.py derives from. Two
independently derived oracles (docs-semantics vs code-structure) agreeing
with each other and with hand-computed golden literals is the strongest
de-circularization available offline; `scripts/validate_pywt_layout.py`
closes the loop in one command wherever real pywt is installable.

Emulated structure (haar, even dyadic sizes, symmetric mode never pads):

- downsampling_convolution: y[o] = sum_j f[j] * x[i - j] at i = 2o + 1
  (convolution.c iterates output positions starting at i = step - 1).
  haar dec_lo = [1, 1]/sqrt2, dec_hi = [-1, 1]/sqrt2 (wavelets_coeffs.h).
- dwtn: `coeffs = [('', data)]; for axis in axes: split every subband
  into (key+'a', cA), (key+'d', cD)` — key char i maps to axes[i].
- dwt2: returns `coefs['aa'], (coefs['da'], coefs['ad'], coefs['dd'])`.
- wavedec2: loop `a, ds = dwt2(a, ...)`, collect ds, append final a,
  reverse — coarsest first.
- coeffs_to_array: key char 'a' -> slice(0, n), 'd' -> slice(n, 2n) on the
  matching axis, so each level tiles [[aa, ad], [da, dd]].

(ref usage being modeled: condition/utils.py:106-139.)
"""

import numpy as np

SQRT2 = np.sqrt(2.0)
DEC_LO = np.array([1.0, 1.0]) / SQRT2
DEC_HI = np.array([-1.0, 1.0]) / SQRT2


def _downsampling_convolution(x, f):
    """convolution.c semantics for even-length x, len-2 filter: output
    o takes input index i = 2o + 1; y[o] = f[0]*x[i] + f[1]*x[i-1]."""
    n = x.shape[-1]
    assert n % 2 == 0, "emulation restricted to even lengths (no padding)"
    return f[0] * x[..., 1::2] + f[1] * x[..., 0::2]


def _dwt_axis(x, axis):
    xm = np.moveaxis(x, axis, -1)
    cA = np.moveaxis(_downsampling_convolution(xm, DEC_LO), -1, axis)
    cD = np.moveaxis(_downsampling_convolution(xm, DEC_HI), -1, axis)
    return cA, cD


def dwtn(data, axes):
    coeffs = [("", np.asarray(data, dtype=np.float64))]
    for axis in axes:
        new_coeffs = []
        for subband, x in coeffs:
            cA, cD = _dwt_axis(x, axis)
            new_coeffs.extend([(subband + "a", cA), (subband + "d", cD)])
        coeffs = new_coeffs
    return dict(coeffs)


def dwt2(data, axes=(-2, -1)):
    coefs = dwtn(data, axes)
    return coefs["aa"], (coefs["da"], coefs["ad"], coefs["dd"])


def wavedec2(data, level, axes=(-2, -1)):
    a = np.asarray(data, dtype=np.float64)
    coeffs_list = []
    for _ in range(level):
        a, ds = dwt2(a, axes)
        coeffs_list.append(ds)
    coeffs_list.append(a)
    coeffs_list.reverse()
    return coeffs_list


def coeffs_to_array(coeffs, axes=(-2, -1)):
    """Tile per level: key char 0 slices axes[0], char 1 slices axes[1];
    'a' is the low half, 'd' the high half."""
    ax_r, ax_c = axes
    arr = np.asarray(coeffs[0])
    for (cH, cV, cD) in coeffs[1:]:        # ('da', 'ad', 'dd')
        top = np.concatenate([arr, cV], axis=ax_c)   # ['aa' | 'ad']
        bot = np.concatenate([cH, cD], axis=ax_c)    # ['da' | 'dd']
        arr = np.concatenate([top, bot], axis=ax_r)
    return arr


def wavedec2_packed(x, level, axes=(-2, -1)):
    return coeffs_to_array(wavedec2(x, level, axes), axes)
