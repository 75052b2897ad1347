#!/usr/bin/env python
"""Diagnose the gaussian_blur/I:tmpd 256px divergence found by parity_256.

tmpd covariance at sigma=80 is sigma^2 * (Jacobian row sums) — a large,
mixed-sign field, so the CG system (sigma_s^2 I + A Sigma A^T) can be
indefinite. This script extracts the REAL tmpd covariance from the FFHQ-size
UNet (random weights), then solves the deblur mat system three ways:
  * our jax CG (preconditioned / unpreconditioned, maxiter 100/1000)
  * scipy CG with the reference's exact matvec (condition.py:360-384)
and reports residuals + pairwise distances of the returned `mat` fields.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from kdip_tpu import diffusion, guidance
from kdip_tpu import operators as kops
from kdip_tpu.models import adm
from kdip_tpu.ops import fft as offt
from kdip_tpu.ops.transforms import OrthoTransform

SIZE = 256
KERNEL = "/root/reference/condition/kernels/gaussian_ks61_std3.0.npy"


def main():
    sigma = float(sys.argv[1]) if len(sys.argv) > 1 else 80.0
    model = adm.ffhq_unet(dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)),
                        jnp.zeros((1,)))["params"]
    tables = diffusion.make_diffusion(1000, "linear")

    def model_apply(p, x, t):
        return model.apply({"params": p}, x, t.astype(jnp.float32))

    kernel = np.load(KERNEL)
    op = kops.get_operator("gaussian_blur", in_shape=(1, 3, SIZE, SIZE),
                           sigma_s=0.05, kernel=kernel)
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.rand(1, SIZE, SIZE, 3).astype(np.float32) * 2 - 1)
    y = op.forward(x0) + 0.05 * jnp.asarray(
        rng.randn(1, SIZE, SIZE, 3).astype(np.float32))
    x = jnp.asarray(rng.randn(1, SIZE, SIZE, 3).astype(np.float32)) * sigma

    cfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="tmpd")
    uncond, var_fn = guidance.make_openai_uncond(model_apply, tables, cfg)

    @jax.jit
    def moments(xx):
        (x0_mean, aux), vjp_fn = jax.vjp(
            lambda z: uncond(params, z, jnp.float32(sigma)), xx)
        zero_aux = jax.tree.map(jnp.zeros_like, aux)
        mean_vjp = lambda ct: vjp_fn((ct, zero_aux))
        theta0_var = var_fn(aux, jnp.float32(sigma), mean_vjp, xx.shape)
        return x0_mean, theta0_var

    x0_mean, theta0_var = moments(x)
    tv = np.asarray(theta0_var)
    print(json.dumps({"sigma": sigma,
                      "theta0_var": {"min": float(tv.min()),
                                     "max": float(tv.max()),
                                     "mean": float(tv.mean()),
                                     "frac_negative": float((tv < 0).mean())}}),
          flush=True)

    ortho = OrthoTransform(None)
    # assemble on host from the real/imag fields (complex64 device->host
    # transfer is UNIMPLEMENTED on the axon backend)
    FB = np.asarray(op.FB_re) + 1j * np.asarray(op.FB_im)
    F2B = np.asarray(op.FB_re) ** 2 + np.asarray(op.FB_im) ** 2
    sigma_s = 0.05
    y_np = np.asarray(y)
    x0m = np.asarray(x0_mean)

    def fft2(a):
        return np.fft.fft2(a, axes=(1, 2))

    def ifft2(a):
        return np.fft.ifft2(a, axes=(1, 2))

    # reference matvec in measurement space (condition.py:370-374)
    def ref_matvec(u_flat):
        u = u_flat.reshape(y_np.shape).astype(np.float32)
        ATu = ifft2(np.conj(FB)[None, ..., None] * fft2(u)).real
        Cu = tv * ATu
        return (sigma_s ** 2 * u
                + ifft2(FB[None, ..., None] * fft2(Cu)).real).flatten()

    b = (y_np - ifft2(FB[None, ..., None] * fft2(x0m)).real).flatten()
    from scipy.sparse.linalg import LinearOperator, cg
    A = LinearOperator((b.size, b.size), matvec=ref_matvec, dtype=np.float32)
    u_scipy, info = cg(A, b, rtol=1e-4, maxiter=1000)
    res_scipy = np.linalg.norm(ref_matvec(u_scipy) - b) / np.linalg.norm(b)
    mat_scipy = ifft2(np.conj(FB)[None, ..., None]
                      * fft2(u_scipy.reshape(y_np.shape))).real
    print(json.dumps({"scipy": {"info": int(info),
                                "rel_residual": float(res_scipy)}}), flush=True)

    results = {}
    for precondition in (True, False):
        for maxiter in (100, 1000):
            c = guidance.GuidanceConfig(guidance="I", x0_cov_type="tmpd",
                                        cg_maxiter=maxiter,
                                        cg_precondition=precondition)
            mat = jax.jit(lambda: guidance.mat_solver(
                op, y, x0_mean, theta0_var, ortho, False, c)[0])()
            mat_np = np.asarray(mat)
            # recover residual: mat = A^T u has no unique u; instead measure
            # consistency of the normal-equation solution via the relation
            # (sigma_s^2 I + A Sigma A^T) u = b with u reconstructed from our
            # CG — rerun internals for the residual
            diff = np.abs(mat_np - mat_scipy)
            results[f"precond={precondition},maxiter={maxiter}"] = {
                "max_abs_vs_scipy": float(diff.max()),
                "rel_l2_vs_scipy": float(np.linalg.norm(diff)
                                         / (np.linalg.norm(mat_scipy) + 1e-12)),
            }
            print(json.dumps({f"ours[{precondition},{maxiter}]":
                              results[f"precond={precondition},maxiter={maxiter}"]}),
                  flush=True)


if __name__ == "__main__":
    main()
