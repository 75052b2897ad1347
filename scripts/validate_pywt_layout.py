#!/usr/bin/env python
"""One-command validation of ops/transforms.dwt2 against REAL PyWavelets.

This environment has no network egress, so PyWavelets cannot be installed
and the in-repo oracles (tests/test_dwt_pywt_layout.py's dense-matrix
construction + tests/pywt_structural.py's code-structure emulation) are
both builder-derived. Wherever pywt IS installable, this script closes the
loop against the actual package in one command:

    pip install PyWavelets && python scripts/validate_pywt_layout.py

It exercises the exact call pattern the reference trained `ffhq_dwt.ckpt`
through (condition/utils.py:106-139): `pywt.wavedec2(x, 'haar', level,
axes)` packed by `pywt.coeffs_to_array`, on the same axes our guidance
path uses, and requires bit-level (1e-12) agreement in float64.

Exit code 0 = all comparisons pass; nonzero with a diff report otherwise.
"""

import sys

import numpy as np


def main() -> int:
    try:
        import pywt
    except ImportError:
        print("PyWavelets is not installed. Run:\n"
              "    pip install PyWavelets && "
              "python scripts/validate_pywt_layout.py")
        return 2

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)

    from kdip_tpu.ops import transforms as tfm

    failures = []
    for level, size in [(1, 8), (2, 16), (3, 32), (3, 64), (3, 256)]:
        rng = np.random.RandomState(level * 100 + size)
        x = rng.randn(2, size, size, 3 if size <= 64 else 1)

        ours = np.asarray(
            tfm.dwt2(jnp.asarray(x, dtype=jnp.float64), level=level))

        # reference usage: transform over (H, W); our layout is NHWC so the
        # oracle runs per channel over axes (-2, -1) of (..., H, W)
        x_chw = np.moveaxis(x, -1, 1)
        coeffs = pywt.wavedec2(x_chw, "haar", level=level, axes=(-2, -1))
        packed, _ = pywt.coeffs_to_array(coeffs, axes=(-2, -1))
        ref = np.moveaxis(packed, 1, -1)

        err = float(np.abs(ours - ref).max())
        status = "OK " if err <= 1e-12 else "FAIL"
        print(f"[{status}] level={level} size={size}: max|diff|={err:.3e}")
        if err > 1e-12:
            failures.append((level, size, err))

        # inverse: idwt2 must invert pywt's packing exactly
        rec = np.asarray(
            tfm.idwt2(jnp.asarray(ref, dtype=jnp.float64), level=level))
        err_inv = float(np.abs(rec - x).max())
        status = "OK " if err_inv <= 1e-10 else "FAIL"
        print(f"[{status}]   idwt2 roundtrip: max|diff|={err_inv:.3e}")
        if err_inv > 1e-10:
            failures.append((level, size, err_inv))

    if failures:
        print(f"\n{len(failures)} comparison(s) FAILED — the DWT layout "
              "does NOT match real pywt; do not trust ffhq_dwt.ckpt "
              "conversions until resolved.")
        return 1
    print("\nAll comparisons match real PyWavelets bit-level: the "
          "checkpoint-conversion layout is validated.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
