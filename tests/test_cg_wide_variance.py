"""CG mat-solver correctness on wide-dynamic-range covariances (the tmpd
regime that broke the preconditioned solve at 256 px — see RESULTS.md and
scripts/debug_tmpd_blur.py): validated against a dense solve at 16 px."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu import guidance
from kdip_tpu import operators as kops
from kdip_tpu.ops import kernels as okernels
from kdip_tpu.ops.transforms import OrthoTransform

SIZE = 16


def dense_solution(op, y, x0_mean, theta0_var):
    """Builds (sigma_s^2 I + A Sigma A^T) densely in measurement space and
    solves exactly; returns A^T u like the deblur mat solver."""
    sigma_s = 0.05
    shape = y.shape

    def A(x):
        return np.asarray(op.forward(jnp.asarray(x)))

    def AT(u):
        return np.asarray(op.transpose(jnp.asarray(u)))

    n = y.size
    M = np.zeros((n, n), np.float64)
    tv = np.asarray(theta0_var).astype(np.float64)
    for i in range(n):
        e = np.zeros(n, np.float32)
        e[i] = 1.0
        u = e.reshape(shape)
        col = sigma_s ** 2 * u + A(tv.astype(np.float32) * AT(u))
        M[:, i] = col.reshape(-1)
    b = np.asarray(y) - A(np.asarray(x0_mean))
    u = np.linalg.solve(M, b.reshape(-1)).reshape(shape)
    return AT(u.astype(np.float32))


def test_deblur_mat_wide_variance_matches_dense():
    kernel = okernels.gaussian_kernel(5, 1.2)
    op = kops.get_operator("gaussian_blur", in_shape=(1, 3, SIZE, SIZE),
                           sigma_s=0.05, kernel=kernel)
    rng = np.random.RandomState(0)
    x0_mean = jnp.asarray(rng.rand(1, SIZE, SIZE, 3).astype(np.float32) * 2 - 1)
    y = op.forward(x0_mean) + 0.05 * jnp.asarray(
        rng.randn(1, SIZE, SIZE, 3).astype(np.float32))
    # tmpd-like variance: nonnegative, 5 orders of magnitude of dynamic range
    tv = jnp.asarray((10.0 ** rng.uniform(-2, 3, (1, SIZE, SIZE, 3)))
                     .astype(np.float32))

    ref = dense_solution(op, y, x0_mean, tv)

    cfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="tmpd",
                                  cg_maxiter=1000)
    assert not cfg.cg_precondition  # correctness-first default
    mat, _ = guidance.mat_solver(op, y, x0_mean, tv, OrthoTransform(None),
                                 False, cfg)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(mat) / scale, ref / scale,
                               atol=2e-3)


def test_cg_warn_fires_on_truncated_solve(capfd):
    """cg_warn prints the reference-style non-convergence warning
    (ref: condition.py:344-345) when maxiter is too small, and stays
    silent when the solve converges."""
    import jax
    import jax.numpy as jnp

    from kdip_tpu import guidance

    # An ill-conditioned diagonal system that cannot converge in 2 iters
    diag = jnp.concatenate([jnp.ones(50) * 1e-3, jnp.ones(50) * 1e3])
    b = jnp.ones(100)

    # cg_warn left at its default: the warning must fire out of the box
    cfg = guidance.GuidanceConfig(cg_maxiter=2, cg_tol=1e-6)
    assert cfg.cg_warn  # correctness-first default, like the reference
    _, resid = jax.block_until_ready(guidance._cg(lambda v: diag * v, b, cfg))
    out = capfd.readouterr()
    assert "CG did not converge" in out.out + out.err
    assert float(resid) > 1e-6  # and the returned residual reports it too

    cfg = guidance.GuidanceConfig(cg_maxiter=500, cg_tol=1e-6)
    _, resid = jax.block_until_ready(guidance._cg(lambda v: diag * v, b, cfg))
    out = capfd.readouterr()
    assert "CG did not converge" not in out.out + out.err
    assert float(resid) <= 1e-6
