#!/usr/bin/env python
"""Production-scale (256 px, full FFHQ 93.6M-param architecture) parity sweep
vs the torch reference (VERDICT r1 next #3).

For each operator x guidance config, runs a few-step deterministic Euler ODE
trajectory through BOTH stacks from the same x_init with shared converted
random weights and records max|delta| / PSNR-between-outputs, plus a CG
iteration-budget study (cg_maxiter 100 vs 1000, the reference's setting) at
the smallest sigma. Writes RESULTS_256.json at the repo root.

Run (CPU, slow — hours for the full matrix):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/parity_256.py
Subset: --operators inpainting --configs I:convert dps
"""

import argparse
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

SIZE = 256
KERNELS = "/root/reference/condition/kernels"

CONFIGS = {
    "I:convert": dict(guidance="I", cov="convert"),
    "I:analytic": dict(guidance="I", cov="analytic"),
    "I:tmpd": dict(guidance="I", cov="tmpd"),
    "II:convert": dict(guidance="II", cov="convert"),
    "dps": dict(guidance="dps", cov="dps", zeta=0.5),
    "pgdm": dict(guidance="pgdm", cov="pgdm"),
    "diffpir": dict(guidance="diffpir", cov="diffpir", lambda_=10.0),
}


def build_models(f64: bool = False):
    from guided_diffusion.script_util import (create_model_and_diffusion,
                                              model_and_diffusion_defaults)

    from kdip_tpu import ckpt, diffusion
    from kdip_tpu.models import adm

    flags = model_and_diffusion_defaults()
    flags.update(dict(image_size=SIZE, num_channels=128, num_res_blocks=1,
                      attention_resolutions="16", dropout=0.0,
                      learn_sigma=True, num_head_channels=64,
                      resblock_updown=True, use_scale_shift_norm=True,
                      diffusion_steps=1000, noise_schedule="linear"))
    t_unet, diff_ref = create_model_and_diffusion(**flags)
    t_unet.eval()
    import jax
    import jax.numpy as jnp
    if f64:
        import torch as _torch
        t_unet = t_unet.double()
        # the reference UNet hard-casts its torso input to self.dtype
        # (unet.py:467,656) — lift it to double with the params
        t_unet.dtype = _torch.float64
        f_model = adm.ffhq_unet(dtype=jnp.float64)
        params = ckpt.convert_adm_state_dict(t_unet.state_dict())
        params = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
    else:
        f_model = adm.ffhq_unet(dtype=jnp.float32)
        params = ckpt.convert_adm_state_dict(t_unet.state_dict())
    # f64 tables match the reference's f64 numpy coefficient tables exactly;
    # f32-rounded tables perturb the tmpd CG system's b/theta at ~1e-8
    # relative, which kappa~2.5e6 amplifies to ~1e-2 in the solution
    tables = diffusion.make_diffusion(
        1000, "linear", dtype=jnp.float64 if f64 else jnp.float32)
    return t_unet, diff_ref, f_model, params, tables


def build_operators(names, x0_t):
    """Returns {name: (ref_op, ref_meas, our_op, our_meas)}; measurement noise
    pinned by seeding torch before each forward."""
    import jax.numpy as jnp
    from functools import partial

    import torch.nn.functional as F
    from condition.dps_utils.resizer import Resizer
    from condition.measurements import (GaussialBlurOperator,
                                        SuperResolutionOperator,
                                        get_operator as ref_get_operator)

    from kdip_tpu import operators as kops
    from kdip_tpu.ops import kernels as okernels

    out = {}
    for name in names:
        if name == "inpainting":
            np.random.seed(0)
            ref_op = ref_get_operator(
                name="inpainting", device="cpu", sigma_s=0.05,
                mask_opt=dict(mask_type="random", mask_prob_range=(0.5, 0.5),
                              image_size=SIZE))
            torch.manual_seed(1)
            ref_meas = ref_op.forward(x0_t.clone(), flatten=True)
            mask = ref_op.mask.numpy()[0].transpose(1, 2, 0)
            our_op = kops.InpaintingOperator(sigma_s=jnp.float32(0.05),
                                             mask=jnp.asarray(mask))
            our_meas = kops.Measurement(
                y=jnp.asarray(ref_meas[0].numpy().transpose(0, 2, 3, 1)))
        elif name in ("gaussian_blur", "motion_blur"):
            fname = ("gaussian_ks61_std3.0.npy" if name == "gaussian_blur"
                     else "motion_ks61_std0.5.npy")
            kernel = np.load(os.path.join(KERNELS, fname))
            ref_op = GaussialBlurOperator.__new__(GaussialBlurOperator)
            ref_op.device = "cpu"
            ref_op.kernel_size = 61
            ref_op.kernel = torch.tensor(kernel.astype(np.float32))
            ref_op.sigma_s = torch.Tensor([0.05])
            ref_op.in_shape = (1, 3, SIZE, SIZE)
            torch.manual_seed(1)
            ref_meas = ref_op.forward(x0_t.clone(), flatten=True)
            our_op = kops.get_operator(name, in_shape=(1, 3, SIZE, SIZE),
                                       sigma_s=0.05, kernel=kernel)
            our_meas = our_op.finalize(
                jnp.asarray(ref_meas[0].numpy().transpose(0, 2, 3, 1)))
        elif name == "super_resolution":
            sf = 4
            mat = os.path.join(KERNELS, "kernels_bicubicx234.mat")
            ref_op = SuperResolutionOperator.__new__(SuperResolutionOperator)
            ref_op.device = "cpu"
            ref_op.up_sample = partial(F.interpolate, scale_factor=sf)
            ref_op.down_sample = Resizer((1, 3, SIZE, SIZE), 1 / sf)
            ref_op.scale_factor = sf
            ref_op.sigma_s = torch.Tensor([0.05])
            # torch.Tensor (capital T) casts to float32 like the reference's
            # __init__ (measurements.py:95-97)
            ref_op.kernel = torch.Tensor(okernels.load_bicubic_mat(mat, sf))
            ref_op.in_shape = (1, 3, SIZE, SIZE)
            ref_op.out_shape = (1, 3, SIZE // sf, SIZE // sf)
            torch.manual_seed(1)
            ref_meas = ref_op.forward(x0_t.clone(), flatten=True)
            our_op = kops.get_operator("super_resolution",
                                       in_shape=(1, 3, SIZE, SIZE),
                                       scale_factor=sf, sigma_s=0.05,
                                       kernel_path=mat)
            our_meas = our_op.finalize(
                jnp.asarray(ref_meas[0].numpy().transpose(0, 2, 3, 1)))
        else:
            raise ValueError(name)
        out[name] = (ref_op, ref_meas, our_op, our_meas)
    return out


def fake_recon_mse():
    """Shared synthetic analytic-variance table (real one needs the released
    checkpoint; parity only needs both sides to read the same table)."""
    from k_diffusion.sampling import get_sigmas_karras
    sigmas = get_sigmas_karras(1000, 1e-2, 80.0, rho=7.0)[:-1]
    mse = sigmas ** 2 / (1 + sigmas ** 2) * 0.9
    return {"sigmas": sigmas, "mse_list": mse}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--operators", nargs="+",
                   default=["inpainting", "gaussian_blur", "motion_blur",
                            "super_resolution"])
    p.add_argument("--configs", nargs="+", default=list(CONFIGS))
    p.add_argument("--steps", type=int, default=2)
    p.add_argument("--skip-cg-study", action="store_true")
    p.add_argument("--f64", action="store_true",
                   help="run BOTH stacks in float64 (model, operator "
                        "spectra, CG) — removes the f32 CG stagnation "
                        "noise proven by scripts/cg_two_sided.py, so the "
                        "tmpd outlier configs must meet the <=1e-3 parity "
                        "bar; results land under 'f64_trajectories'")
    p.add_argument("--cg-tight", action="store_true",
                   help="two-sided CG convergence study (VERDICT r2 next #1):"
                        " patch the REFERENCE's scipy cg calls "
                        "(condition.py:343,379,432) to rtol=1e-7/"
                        "maxiter=10000 and run OUR solver at the same "
                        "tolerance, so both stacks converge to the same "
                        "fixed point; results land under 'cg_tight'")
    p.add_argument("--v2", action="store_true",
                   help="run the learned-covariance (V2) configs instead of "
                        "the v1 covariance matrix; merges into --out under "
                        "'trajectories' with a v2: prefix")
    p.add_argument("--out", default=os.path.join(REPO, "RESULTS_256.json"))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from condition.condition import ConditionOpenAIDenoiser
    from k_diffusion.sampling import sample_euler as ref_sample_euler

    from kdip_tpu import guidance, samplers, schedules

    if args.f64:
        jax.config.update("jax_enable_x64", True)

    our_cg_tol, our_cg_maxiter = 1e-4, 1000
    if args.cg_tight:
        # patch the reference's module-level `cg` name so every solver call
        # (condition.py:343,379,432) runs at matched tight tolerance; ours
        # gets the same numbers through GuidanceConfig below
        import condition.condition as _cc
        _orig_cg = _cc.cg

        # f32 cannot reach below ~1e-7 relative residual; f64 can — and the
        # tmpd system's conditioning (kappa ~ (sigma_s^2+theta_max)/sigma_s^2
        # ~ 2.5e6 at sigma=80) amplifies the stopping residual by kappa, so
        # the f64 run needs rtol ~1e-10 to land under the 1e-3 parity bar
        tight_tol = 1e-10 if args.f64 else 1e-7
        tight_iters = 20000 if args.f64 else 10000

        def _tight_cg(A, b, *a, **kw):
            kw.pop("tol", None)
            kw.pop("rtol", None)
            kw["maxiter"] = tight_iters
            return _orig_cg(A, b, *a, rtol=tight_tol, **kw)

        _cc.cg = _tight_cg
        our_cg_tol, our_cg_maxiter = tight_tol, tight_iters

    t_unet, diff_ref, f_model, params, tables = build_models(f64=args.f64)

    rng = np.random.RandomState(1)
    x0 = rng.rand(1, 3, SIZE, SIZE).astype(np.float32) * 2 - 1
    x0_t = torch.tensor(x0)
    ops = build_operators(args.operators, x0_t)
    recon_ref = fake_recon_mse()
    recon_ours = {"sigmas": jnp.asarray(recon_ref["sigmas"].numpy()),
                  "mse_list": jnp.asarray(recon_ref["mse_list"].numpy())}

    sigmas = schedules.get_sigmas_karras(args.steps, 0.01, 80.0)
    x_init = (rng.randn(1, 3, SIZE, SIZE) * 80.0).astype(np.float32)

    if args.f64:
        # lift BOTH stacks to double: measurements were generated in f32
        # (production semantics, identical bytes both sides), everything
        # downstream — model, operator spectra, CG — runs in f64
        from torch.fft import fft2 as tfft2
        from condition.measurements import pre_calculate

        # the reference's timestep_embedding hardcodes float32
        # (guided_diffusion/nn.py:113-117) and then feeds the double
        # time_embed Linear; our flax embedding also computes the sinusoid
        # in f32 and casts (models/layers.py:20-32), so cast-after matches
        # both semantics bit-for-bit
        import guided_diffusion.unet as _gu
        import guided_diffusion.nn as _gn
        _orig_te = _gu.timestep_embedding

        def _te_double(timesteps, dim, max_period=10000):
            return _orig_te(timesteps, dim, max_period).double()

        _gu.timestep_embedding = _te_double

        # GroupNorm32 hard-casts to f32 (nn.py:17-19); in the f64 run the
        # statistics must be double like our flax GroupNorm's
        def _gn_double(self, x):
            return torch.nn.GroupNorm.forward(self, x.double()).type(x.dtype)

        _gn.GroupNorm32.forward = _gn_double

        x_init = x_init.astype(np.float64)
        x0_t64 = x0_t.double()

        def ours_f64(a):
            a = jnp.asarray(a)
            if jnp.issubdtype(a.dtype, jnp.floating):
                return a.astype(jnp.float64)
            return a

        tables = jax.tree.map(ours_f64, tables)
        for name in list(ops):
            ref_op, ref_meas, our_op, our_meas = ops[name]
            ref_op.sigma_s = ref_op.sigma_s.double()
            y64 = ref_meas[0].double()
            ref_meas = (y64, y64.reshape(y64.shape[0], -1))
            if hasattr(ref_op, "kernel"):
                ref_op.kernel = ref_op.kernel.double()
            if name in ("gaussian_blur", "motion_blur"):
                k = ref_op.get_kernel()
                FB, FBC, F2B, _ = pre_calculate(x0_t64, k, 1)
                ref_op.pre_calculated = (FB, FBC, F2B, FBC * tfft2(y64))
            elif name == "super_resolution":
                k = ref_op.get_kernel()
                ref_op.pre_calculated = pre_calculate(
                    y64, k, ref_op.scale_factor)
            elif name == "inpainting":
                ref_op.mask = ref_op.mask.double()
            our_op = jax.tree.map(ours_f64, our_op)
            our_meas = jax.tree.map(ours_f64, our_meas)
            ops[name] = (ref_op, ref_meas, our_op, our_meas)

    def model_apply(p_, x, t):
        return f_model.apply({"params": p_}, x, t.astype(x.dtype))

    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
        results.setdefault("trajectories", {})
        results.setdefault("cg_study", {})
    else:
        results = {"steps": args.steps, "size": SIZE, "trajectories": {},
                   "cg_study": {}}

    if args.v2:
        run_v2(args, t_unet, diff_ref, f_model, params, tables, ops, sigmas,
               x_init, results)
        return

    for op_name, (ref_op, ref_meas, our_op, our_meas) in ops.items():
        for cfg_name in args.configs:
            c = CONFIGS[cfg_name]
            t0 = time.time()
            ref_cond = ConditionOpenAIDenoiser(
                inner_model=t_unet, diffusion=diff_ref, operator=ref_op,
                measurement=ref_meas, guidance=c["guidance"],
                x0_cov_type=c["cov"],
                recon_mse=recon_ref if c["cov"] == "analytic" else None,
                zeta=c.get("zeta"), lambda_=c.get("lambda_"),
                device="cpu").eval()
            if args.f64:
                # casts the k-diffusion wrapper's f32 sigma buffers too
                ref_cond = ref_cond.double()
            ref_out = ref_sample_euler(
                ref_cond, torch.tensor(x_init),
                torch.tensor(np.asarray(sigmas)), disable=True)
            t_ref = time.time() - t0

            gcfg = guidance.GuidanceConfig(
                guidance=c["guidance"], x0_cov_type=c["cov"],
                zeta=c.get("zeta"), lambda_=c.get("lambda_"),
                cg_tol=our_cg_tol, cg_maxiter=our_cg_maxiter)
            uncond, var_fn = guidance.make_openai_uncond(
                model_apply, tables, gcfg,
                recon_mse=recon_ours if c["cov"] == "analytic" else None)
            denoise = guidance.make_condition_denoiser(
                uncond, var_fn, our_op, our_meas, gcfg, params=params)
            t0 = time.time()
            our_out = samplers.sample_euler(
                lambda x, s, k: denoise(x, s, k),
                jnp.asarray(x_init.transpose(0, 2, 3, 1)), sigmas,
                jax.random.key(0))
            our_np = np.asarray(our_out).transpose(0, 3, 1, 2)
            t_ours = time.time() - t0

            ref_np = ref_out.detach().numpy()
            diff = np.abs(our_np - ref_np)
            mse = float(np.mean((our_np - ref_np) ** 2))
            psnr = float(10 * np.log10(4.0 / mse)) if mse > 0 else float("inf")
            rec = {"max_abs": float(diff.max()), "mean_abs": float(diff.mean()),
                   "psnr_between": round(psnr, 2),
                   "ref_sec": round(t_ref, 1), "ours_sec": round(t_ours, 1)}
            if args.f64:
                rec["cg"] = {"tol": our_cg_tol, "maxiter": our_cg_maxiter}
                results.setdefault("f64_trajectories", {})[
                    f"{op_name}/{cfg_name}"] = rec
            elif args.cg_tight:
                rec["cg"] = {"tol": our_cg_tol, "maxiter": our_cg_maxiter,
                             "both_sides": True}
                results.setdefault("cg_tight", {})[
                    f"{op_name}/{cfg_name}"] = rec
            else:
                results["trajectories"][f"{op_name}/{cfg_name}"] = rec
            print(f"{op_name}/{cfg_name}: {rec}", flush=True)
            with open(args.out, "w") as f:  # incremental: survive crashes
                json.dump(results, f, indent=2)

    if not args.skip_cg_study:
        # CG residual at the smallest sigma (tensor covariance -> CG branch)
        from kdip_tpu.ops.transforms import OrthoTransform
        ortho = OrthoTransform(None)
        sigma_small = jnp.float32(0.05)
        for op_name, (_, _, our_op, our_meas) in ops.items():
            uncond, var_fn = guidance.make_openai_uncond(
                model_apply, tables,
                guidance.GuidanceConfig(guidance="I", x0_cov_type="convert"))
            x_t = jnp.asarray(
                (x0 + 0.05 * rng.randn(1, 3, SIZE, SIZE).astype(np.float32))
                .transpose(0, 2, 3, 1)) * 1.0
            x0_mean, aux = uncond(params, x_t, sigma_small)
            theta0_var = var_fn(aux, sigma_small, None, None)
            entry = {}
            sols = {}
            for maxiter in (100, 1000):
                gcfg = guidance.GuidanceConfig(guidance="I",
                                               x0_cov_type="convert",
                                               cg_maxiter=maxiter)
                mat, _ = guidance.mat_solver(our_op, our_meas.y, x0_mean,
                                             theta0_var, ortho, False, gcfg)
                sols[maxiter] = np.asarray(mat)
            delta = np.abs(sols[100] - sols[1000])
            denom = float(np.abs(sols[1000]).max()) or 1.0
            entry = {"max_abs_diff_100_vs_1000": float(delta.max()),
                     "rel_max": float(delta.max()) / denom}
            results["cg_study"][op_name] = entry
            print(f"cg_study {op_name}: {entry}", flush=True)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    print("wrote", args.out)




def run_v2(args, t_unet, diff_ref, f_model, params, tables, ops, sigmas,
           x_init, results):
    """Learned-covariance (V2) trajectory parity: ConditionOpenAIDenoiserV2
    with a random out_cov head vs make_openai_v2_uncond, Type I and II in
    the DCT ortho basis (the reference's pywt DWT is stubbed in this env;
    the DWT layout itself is pinned by tests/test_dwt_pywt_layout.py)."""
    import jax
    import jax.numpy as jnp
    from condition.condition import ConditionOpenAIDenoiserV2
    from k_diffusion.external import OpenAIDenoiserV2
    from k_diffusion.sampling import sample_euler as ref_sample_euler

    from kdip_tpu import ckpt, guidance, samplers
    from kdip_tpu.models import adm

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

    for op_name, (ref_op, ref_meas, our_op, our_meas) in ops.items():
        for gname in ("I", "II"):
            t0 = time.time()
            ref_cond = ConditionOpenAIDenoiserV2(
                denoiser=ref_v2, operator=ref_op, measurement=ref_meas,
                guidance=gname, device="cpu", ortho_tf_type="dct").eval()
            ref_out = ref_sample_euler(
                ref_cond, torch.tensor(x_init),
                torch.tensor(np.asarray(sigmas)), disable=True)
            t_ref = time.time() - t0

            gcfg = guidance.GuidanceConfig(
                guidance=gname, x0_cov_type="convert", ortho_tf_type="dct",
                cg_maxiter=1000)
            uncond, var_fn = guidance.make_openai_v2_uncond(
                model_apply_v2, tables, gcfg)
            denoise = guidance.make_condition_denoiser(
                uncond, var_fn, our_op, our_meas, gcfg, params=params_v2,
                v2=True)
            t0 = time.time()
            our_out = samplers.sample_euler(
                lambda x, s, k: denoise(x, s, k),
                jnp.asarray(x_init.transpose(0, 2, 3, 1)), sigmas,
                jax.random.key(0))
            our_np = np.asarray(our_out).transpose(0, 3, 1, 2)
            t_ours = time.time() - t0

            ref_np = ref_out.detach().numpy()
            diff = np.abs(our_np - ref_np)
            mse = float(np.mean((our_np - ref_np) ** 2))
            psnr = float(10 * np.log10(4.0 / mse)) if mse > 0 else float("inf")
            rec = {"max_abs": float(diff.max()),
                   "mean_abs": float(diff.mean()),
                   "psnr_between": round(psnr, 2),
                   "ref_sec": round(t_ref, 1), "ours_sec": round(t_ours, 1)}
            results["trajectories"][f"{op_name}/v2:{gname}:dct"] = rec
            print(f"{op_name}/v2:{gname}:dct: {rec}", flush=True)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
