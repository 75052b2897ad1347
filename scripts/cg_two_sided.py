#!/usr/bin/env python
"""Root-cause the tmpd CG parity gap (VERDICT r2 next #1, two-sided).

At matched tight tolerance (both stacks tol=1e-7 / maxiter=10000,
RESULTS_256.json 'cg_tight') the gaussian/motion-blur I:tmpd gap only shrank
0.073 -> 0.056 — so "the reference stops early" is NOT the explanation.
Hypothesis: both CG solves run in float32, where rtol=1e-7 is below machine
epsilon; on the ill-conditioned tmpd system (theta in [0, 6.4e3] at sigma=80)
both solvers STAGNATE at different iterates of the same fixed point.

This script proves or refutes that in one pass, for the deblur system
(ref: condition/condition.py:349-385; ours: kdip_tpu/guidance.py deblur_mat):

1. capture (y, x0_mean, theta0_var) from BOTH stacks at sigma=80 by patching
   the module-level mat-solver names (no trajectory needed);
2. quantify system agreement: |x0_mean_ref - x0_mean_ours|,
   |theta_ref - theta_ours| — if these are ~1e-4-scale, the two stacks pose
   the same linear system;
3. rebuild the system in float64 numpy (same FFT formula, ref's FB kernel
   spectra — bit-identical kernels by construction) once with the ref
   moments and once with ours, solve each with scipy CG at rtol=1e-10, and
   compare the converged pullbacks mat = real(ifft2(FBC*fft2(u)));
4. measure each stack's float32 iterate against its own f64 fixed point.

Verdict rule: if (3) agrees to ~1e-3 while (4) shows ~0.05-scale error in
both stacks, the production gap is f32 CG stagnation noise on a shared
system — not a system mismatch. Writes RESULTS_256.json['cg_two_sided'].

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/cg_two_sided.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
import refshim

refshim.install()

import numpy as np  # noqa: E402
import torch  # noqa: E402

torch.manual_seed(0)
torch.set_num_threads(os.cpu_count() or 1)

import parity_256  # noqa: E402  (reuses the model/operator builders)

SIZE = 256


def np_fft2(x):
    return np.fft.fft2(x, axes=(-2, -1))


def np_ifft2(x):
    return np.fft.ifft2(x, axes=(-2, -1))


def f64_deblur_solve(FB, FBC, theta, y, x0_mean, sigma_s, rtol=1e-10,
                     maxiter=40000):
    """The reference's deblur CG system (condition.py:357-385) in float64
    numpy, solved to convergence; returns (u, mat_pullback, info, iters).
    All args CHW float64 / complex128."""
    from scipy.sparse.linalg import LinearOperator, cg

    shape = y.shape

    n_iters = [0]

    def matvec(u):
        n_iters[0] += 1
        u = u.reshape(shape)
        inner = np_ifft2(FBC * np_fft2(u)).real
        u = sigma_s ** 2 * u + np_ifft2(FB * np_fft2(theta * inner)).real
        return u.ravel()

    A = LinearOperator((y.size, y.size), matvec=matvec, dtype=np.float64)
    b = (y - np_ifft2(FB * np_fft2(x0_mean)).real).ravel()
    u, info = cg(A, b, rtol=rtol, atol=0.0, maxiter=maxiter)
    u = u.reshape(shape)
    mat = np_ifft2(FBC * np_fft2(u)).real
    return u, mat, info, n_iters[0]


def f64_deblur_solve_ot(FB, FBC, theta_ot, y, x0_mean, sigma_s,
                        rtol=1e-10, maxiter=40000):
    """The V2 variant of the deblur system: learned per-coefficient variance
    in the DCT ortho basis (ref: condition.py:361-385 with ortho_tf='dct').
    theta_ot is the variance in coefficient space; the covariance acts as
    C = idctn(theta_ot * dctn(.)) with scipy's all-axes orthonormal DCT
    (condition/utils.py:88-103; batch axis is size 1 => identity)."""
    from scipy.fft import dctn, idctn
    from scipy.sparse.linalg import LinearOperator, cg

    shape = y.shape
    n_iters = [0]

    def matvec(u):
        n_iters[0] += 1
        u = u.reshape(shape)
        inner = np_ifft2(FBC * np_fft2(u)).real
        Cu = idctn(theta_ot * dctn(inner, norm="ortho"), norm="ortho")
        u = sigma_s ** 2 * u + np_ifft2(FB * np_fft2(Cu)).real
        return u.ravel()

    A = LinearOperator((y.size, y.size), matvec=matvec, dtype=np.float64)
    b = (y - np_ifft2(FB * np_fft2(x0_mean)).real).ravel()
    u, info = cg(A, b, rtol=rtol, atol=0.0, maxiter=maxiter)
    u = u.reshape(shape)
    mat = np_ifft2(FBC * np_fft2(u)).real
    return u, mat, info, n_iters[0]


def main_v2(op_name):
    """Two-sided f64 study of the V2 learned-covariance deblur system
    (VERDICT r2: extend the v1 analysis to the V2 Type-I outliers).

    Same protocol as main(): capture (y, x0_mean, theta_dct) from BOTH
    stacks at a sigma below mle_sigma_thres (so the learned DCT-basis
    covariance drives the non-isotropic CG path, condition.py:293-295),
    rebuild the system in f64, converge both, compare fixed points, and
    measure each stack's f32 production iterate against its own fixed point.
    """
    import jax
    import jax.numpy as jnp
    import condition.condition as cc
    from condition.condition import ConditionOpenAIDenoiserV2
    from condition.utils import OrthoTransform as RefOT
    from k_diffusion.external import OpenAIDenoiserV2

    from kdip_tpu import ckpt, guidance
    from kdip_tpu.models import adm
    from kdip_tpu.ops.transforms import OrthoTransform

    t_unet, diff_ref, f_model, params, tables = parity_256.build_models()
    rng = np.random.RandomState(1)
    x0 = rng.rand(1, 3, SIZE, SIZE).astype(np.float32) * 2 - 1
    x0_t = torch.tensor(x0)
    ops = parity_256.build_operators([op_name], x0_t)
    ref_op, ref_meas, our_op, our_meas = ops[op_name]

    # V2 heads: random out_cov, converted to our side (parity_256.run_v2)
    ref_v2 = OpenAIDenoiserV2(t_unet, diff_ref, device="cpu",
                              ortho_tf_type="dct")
    torch.manual_seed(1)
    torch.nn.init.normal_(ref_v2.out_cov.weight, std=0.05)
    torch.nn.init.normal_(ref_v2.out_cov.bias, std=0.05)
    ref_v2 = ref_v2.eval()
    f_v2 = adm.ADMUNetV2(unet=f_model)
    params_v2 = {
        "unet": params,
        "out_cov": ckpt.convert_v2_out_cov(
            {"out_cov.weight": ref_v2.out_cov.weight.detach(),
             "out_cov.bias": ref_v2.out_cov.bias.detach()}),
    }

    def model_apply_v2(p_, x_scaled, t):
        return f_v2.apply({"params": p_}, x_scaled,
                          jnp.broadcast_to(t, (x_scaled.shape[0],)))

    # below mle_sigma_thres=0.2 (both defaults) => learned-covariance CG path
    sigma = 0.1
    x_in = (x0 + rng.randn(1, 3, SIZE, SIZE) * sigma).astype(np.float32)

    cap = {}
    orig_deblur = cc._deblur_mat

    def cap_deblur(operator, y, x0_mean, theta0_var, ortho_tf=None):
        cap["ref"] = (y.detach().clone(), x0_mean.detach().clone(),
                      theta0_var.detach().clone())
        args = (operator, y, x0_mean, theta0_var)
        return orig_deblur(*args) if ortho_tf is None \
            else orig_deblur(*args, ortho_tf)

    cc._deblur_mat = cap_deblur
    ref_cond = ConditionOpenAIDenoiserV2(
        denoiser=ref_v2, operator=ref_op, measurement=ref_meas,
        guidance="I", device="cpu", ortho_tf_type="dct").eval()
    t0 = time.time()
    ref_out = ref_cond(torch.tensor(x_in), torch.tensor([sigma]))
    print(f"ref v2 denoise: {time.time()-t0:.1f}s", flush=True)
    cc._deblur_mat = orig_deblur
    y_ref, mu_ref, th_ref = [t.numpy().astype(np.float64) for t in cap["ref"]]

    # Our side: the V2 'switch' dispatch runs inside lax.cond (traced), so
    # instead of patching, compute the system inputs with the exact
    # functions make_condition_denoiser wires into that branch
    # (uncond -> (x0_mean, aux); var_fn(aux) -> (x0_var, theta0_var)).
    gcfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="convert",
                                   ortho_tf_type="dct", cg_maxiter=1000)
    uncond, var_fn = guidance.make_openai_v2_uncond(
        model_apply_v2, tables, gcfg)
    t0 = time.time()
    x_nhwc = jnp.asarray(x_in.transpose(0, 2, 3, 1))
    x0_mean_j, aux_j = uncond(params_v2, x_nhwc, jnp.float32(sigma))
    _, theta_j = var_fn(aux_j, jnp.float32(sigma))
    print(f"our v2 moments (eager): {time.time()-t0:.1f}s", flush=True)
    cap["ours"] = (np.asarray(our_meas.y), np.asarray(x0_mean_j),
                   np.asarray(jnp.broadcast_to(theta_j, x0_mean_j.shape)))
    orig_ours = guidance.deblur_mat

    def to_chw(a):
        return np.asarray(a).transpose(0, 3, 1, 2).astype(np.float64)

    # our theta lives in our NHWC DCT layout; transposing coefficient axes
    # to NCHW aligns it with the reference's all-axes dctn layout (B=1)
    y_ours, mu_ours, th_ours = [to_chw(a) for a in cap["ours"]]

    sys_agree = {
        "y_max_abs": float(np.abs(y_ref - y_ours).max()),
        "x0_mean_max_abs": float(np.abs(mu_ref - mu_ours).max()),
        "theta_max_abs": float(np.abs(th_ref - th_ours).max()),
        "theta_rel": float(np.abs(th_ref - th_ours).max()
                           / max(np.abs(th_ref).max(), 1e-30)),
        "theta_range": [float(th_ref.min()), float(th_ref.max())],
    }
    print("system agreement:", sys_agree, flush=True)

    FB, FBC, F2B, FBFy = [t.resolve_conj().numpy().astype(np.complex128)
                          for t in ref_op.pre_calculated]
    sigma_s = float(np.clip(ref_op.sigma_s.numpy(), 0.001, None))

    t0 = time.time()
    u_ref, mat_ref64, info_r, it_r = f64_deblur_solve_ot(
        FB, FBC, th_ref, y_ref, mu_ref, sigma_s)
    u_ours, mat_ours64, info_o, it_o = f64_deblur_solve_ot(
        FB, FBC, th_ours, y_ours, mu_ours, sigma_s)
    print(f"f64 solves: {time.time()-t0:.1f}s, info=({info_r},{info_o}), "
          f"iters=({it_r},{it_o})", flush=True)

    fixed_point = {
        "mat64_max_abs_diff": float(np.abs(mat_ref64 - mat_ours64).max()),
        "mat64_scale": float(np.abs(mat_ref64).max()),
        "info_ref": int(info_r), "info_ours": int(info_o),
        "iters_ref": int(it_r), "iters_ours": int(it_o),
    }
    print("f64 fixed-point agreement:", fixed_point, flush=True)

    mat_ref32 = orig_deblur(ref_op,
                            *[torch.tensor(a, dtype=torch.float32)
                              for a in (y_ref, mu_ref, th_ref)],
                            RefOT("dct"))
    mat_ref32 = mat_ref32.numpy().astype(np.float64)
    mat_ours32 = np.asarray(orig_ours(
        our_op, jnp.asarray(cap["ours"][0]), jnp.asarray(cap["ours"][1]),
        jnp.asarray(cap["ours"][2]), OrthoTransform("dct"), False, gcfg))
    mat_ours32 = mat_ours32.transpose(0, 3, 1, 2).astype(np.float64)

    stagnation = {
        "ref32_vs_ref64_max_abs": float(np.abs(mat_ref32 - mat_ref64).max()),
        "ours32_vs_ours64_max_abs": float(
            np.abs(mat_ours32 - mat_ours64).max()),
        "ref32_vs_ours32_max_abs": float(
            np.abs(mat_ref32 - mat_ours32).max()),
    }
    print("f32 stagnation:", stagnation, flush=True)

    out_path = os.path.join(REPO, "RESULTS_256.json")
    results = json.load(open(out_path)) if os.path.exists(out_path) else {}
    results.setdefault("cg_two_sided", {})[f"{op_name}/v2:I:dct"] = {
        "sigma": sigma, "system_agreement": sys_agree,
        "f64_fixed_point": fixed_point, "f32_stagnation": stagnation}
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    print("wrote", out_path)


def main():
    import jax
    import jax.numpy as jnp
    import condition.condition as cc
    from condition.condition import ConditionOpenAIDenoiser

    from kdip_tpu import guidance

    op_name = sys.argv[1] if len(sys.argv) > 1 else "gaussian_blur"
    t_unet, diff_ref, f_model, params, tables = parity_256.build_models()
    rng = np.random.RandomState(1)
    x0 = rng.rand(1, 3, SIZE, SIZE).astype(np.float32) * 2 - 1
    x0_t = torch.tensor(x0)
    ops = parity_256.build_operators([op_name], x0_t)
    ref_op, ref_meas, our_op, our_meas = ops[op_name]

    sigma = 80.0
    x_in = (rng.randn(1, 3, SIZE, SIZE) * sigma).astype(np.float32)

    # ---- capture the reference's system inputs at sigma=80 ----
    cap = {}
    orig_deblur = cc._deblur_mat

    def cap_deblur(operator, y, x0_mean, theta0_var, ortho_tf=None):
        cap["ref"] = (y.detach().clone(), x0_mean.detach().clone(),
                      theta0_var.detach().clone())
        args = (operator, y, x0_mean, theta0_var)
        return orig_deblur(*args) if ortho_tf is None \
            else orig_deblur(*args, ortho_tf)

    cc._deblur_mat = cap_deblur
    ref_cond = ConditionOpenAIDenoiser(
        inner_model=t_unet, diffusion=diff_ref, operator=ref_op,
        measurement=ref_meas, guidance="I", x0_cov_type="tmpd",
        recon_mse=None, device="cpu").eval()
    t0 = time.time()
    # no torch.no_grad(): the tmpd covariance needs autograd for its vjp
    ref_out = ref_cond(torch.tensor(x_in), torch.tensor([sigma]))
    print(f"ref denoise: {time.time()-t0:.1f}s", flush=True)
    cc._deblur_mat = orig_deblur
    y_ref, mu_ref, th_ref = [t.numpy().astype(np.float64) for t in cap["ref"]]

    # ---- capture ours (eager, so the closure holds concrete arrays) ----
    orig_ours = guidance.deblur_mat

    def cap_ours(op, y, x0_mean, theta0_var, ortho_tf, iso, cfg):
        if not iso:
            cap["ours"] = (np.asarray(y), np.asarray(x0_mean),
                           np.asarray(theta0_var))
        return orig_ours(op, y, x0_mean, theta0_var, ortho_tf, iso, cfg)

    guidance.deblur_mat = cap_ours
    gcfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="tmpd",
                                   cg_tol=1e-7, cg_maxiter=10000)
    uncond, var_fn = guidance.make_openai_uncond(
        lambda p, x, t: f_model.apply({"params": p}, x,
                                      t.astype(jnp.float32)),
        tables, gcfg)
    denoise = guidance.make_condition_denoiser(
        uncond, var_fn, our_op, our_meas, gcfg, params=params)
    t0 = time.time()
    our_out = denoise(jnp.asarray(x_in.transpose(0, 2, 3, 1)),
                      jnp.float32(sigma), jax.random.key(0))
    print(f"our denoise (eager): {time.time()-t0:.1f}s", flush=True)
    guidance.deblur_mat = orig_ours

    def to_chw(a):
        return np.asarray(a).transpose(0, 3, 1, 2).astype(np.float64)

    y_ours, mu_ours, th_ours = [to_chw(a) for a in cap["ours"]]

    # ---- 2. system agreement ----
    sys_agree = {
        "y_max_abs": float(np.abs(y_ref - y_ours).max()),
        "x0_mean_max_abs": float(np.abs(mu_ref - mu_ours).max()),
        "theta_max_abs": float(np.abs(th_ref - th_ours).max()),
        "theta_rel": float(np.abs(th_ref - th_ours).max()
                           / max(np.abs(th_ref).max(), 1e-30)),
        "theta_range": [float(th_ref.min()), float(th_ref.max())],
    }
    print("system agreement:", sys_agree, flush=True)

    # ---- 3. f64 fixed points of both systems (ref FB spectra, exact) ----
    FB, FBC, F2B, FBFy = [t.resolve_conj().numpy().astype(np.complex128)
                          for t in ref_op.pre_calculated]
    sigma_s = float(np.clip(ref_op.sigma_s.numpy(), 0.001, None))

    t0 = time.time()
    u_ref, mat_ref64, info_r, it_r = f64_deblur_solve(
        FB, FBC, th_ref, y_ref, mu_ref, sigma_s)
    u_ours, mat_ours64, info_o, it_o = f64_deblur_solve(
        FB, FBC, th_ours, y_ours, mu_ours, sigma_s)
    print(f"f64 solves: {time.time()-t0:.1f}s, info=({info_r},{info_o}), "
          f"iters=({it_r},{it_o})", flush=True)

    fixed_point = {
        "mat64_max_abs_diff": float(np.abs(mat_ref64 - mat_ours64).max()),
        "mat64_scale": float(np.abs(mat_ref64).max()),
        "info_ref": int(info_r), "info_ours": int(info_o),
        "iters_ref": int(it_r), "iters_ours": int(it_o),
    }
    print("f64 fixed-point agreement:", fixed_point, flush=True)

    # ---- 4. each stack's f32 iterate vs its own f64 fixed point ----
    # ref f32 solve of its own system (the production call)
    mat_ref32 = orig_deblur(ref_op, *[torch.tensor(a, dtype=torch.float32)
                                      for a in (y_ref, mu_ref, th_ref)])
    mat_ref32 = mat_ref32.numpy().astype(np.float64)
    # our f32 solve of our system (production config)
    from kdip_tpu.ops.transforms import OrthoTransform
    mat_ours32 = np.asarray(orig_ours(
        our_op, jnp.asarray(cap["ours"][0]), jnp.asarray(cap["ours"][1]),
        jnp.asarray(cap["ours"][2]), OrthoTransform(None), False, gcfg))
    mat_ours32 = mat_ours32.transpose(0, 3, 1, 2).astype(np.float64)

    stagnation = {
        "ref32_vs_ref64_max_abs": float(np.abs(mat_ref32 - mat_ref64).max()),
        "ours32_vs_ours64_max_abs": float(
            np.abs(mat_ours32 - mat_ours64).max()),
        "ref32_vs_ours32_max_abs": float(
            np.abs(mat_ref32 - mat_ours32).max()),
    }
    print("f32 stagnation:", stagnation, flush=True)

    out_path = os.path.join(REPO, "RESULTS_256.json")
    results = json.load(open(out_path)) if os.path.exists(out_path) else {}
    results.setdefault("cg_two_sided", {})[op_name] = {
        "sigma": sigma, "system_agreement": sys_agree,
        "f64_fixed_point": fixed_point, "f32_stagnation": stagnation}
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    print("wrote", out_path)


if __name__ == "__main__":
    if "--v2" in sys.argv:
        sys.argv.remove("--v2")
        main_v2(sys.argv[1] if len(sys.argv) > 1 else "gaussian_blur")
    else:
        main()
