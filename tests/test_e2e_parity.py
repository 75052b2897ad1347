"""Full-pipeline parity: N deterministic ODE sampler steps through the
complete guided stack (sampler -> guidance -> covariance -> mat solver ->
UNet) must produce the same reconstruction as the reference, from the same
initial noise."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu import ckpt, diffusion, guidance, samplers, schedules
from kdip_tpu import operators as kops
from kdip_tpu.models import adm

SIZE = 32
STEPS = 6


@pytest.fixture(scope="module")
def stack(reference_path):
    import torch
    from guided_diffusion.unet import UNetModel
    from guided_diffusion.script_util import create_gaussian_diffusion

    torch.manual_seed(0)
    torch_unet = UNetModel(image_size=SIZE, in_channels=3, model_channels=32,
                           out_channels=6, num_res_blocks=1,
                           attention_resolutions={2}, dropout=0.0,
                           channel_mult=(1, 2), num_heads=4, num_head_channels=16,
                           use_scale_shift_norm=True, resblock_updown=True).eval()
    diff_ref = create_gaussian_diffusion(steps=1000, learn_sigma=True,
                                         noise_schedule="linear")
    flax_model = adm.ADMUNet(image_size=SIZE, in_channels=3, model_channels=32,
                             out_channels=6, num_res_blocks=1,
                             attention_resolutions=(2,), dropout=0.0,
                             channel_mult=(1, 2), num_heads=4,
                             num_head_channels=16, use_scale_shift_norm=True,
                             resblock_updown=True)
    params = ckpt.convert_adm_state_dict(torch_unet.state_dict())
    tables = diffusion.make_diffusion(1000, "linear")
    return torch_unet, diff_ref, flax_model, params, tables


@pytest.mark.parametrize("guidance_name,cov,extra,ref_extra", [
    ("I", "convert", {}, {}),
    ("pgdm", "pgdm", {}, {}),
    ("dps", "dps", {"zeta": 0.5}, {"zeta": 0.5}),
])
def test_full_ode_trajectory_parity(reference_path, stack, guidance_name, cov,
                                    extra, ref_extra):
    import torch
    from condition.condition import ConditionOpenAIDenoiser
    from condition.measurements import get_operator as ref_get_operator
    from k_diffusion.sampling import sample_euler as ref_sample_euler

    torch_unet, diff_ref, flax_model, params, tables = stack

    np.random.seed(0)
    ref_op = ref_get_operator(name="inpainting", device="cpu", sigma_s=0.05,
                              mask_opt=dict(mask_type="random",
                                            mask_prob_range=(0.5, 0.5),
                                            image_size=SIZE))
    rng = np.random.RandomState(1)
    x0 = rng.rand(1, 3, SIZE, SIZE).astype(np.float32) * 2 - 1
    torch.manual_seed(1)
    ref_meas = ref_op.forward(torch.tensor(x0).clone(), flatten=True)

    ref_cond = ConditionOpenAIDenoiser(
        inner_model=torch_unet, diffusion=diff_ref, operator=ref_op,
        measurement=ref_meas, guidance=guidance_name, x0_cov_type=cov,
        recon_mse=None, device="cpu", **ref_extra).eval()

    sigmas = schedules.get_sigmas_karras(STEPS, 0.01, 80.0)
    x_init = (rng.randn(1, 3, SIZE, SIZE) * 80.0).astype(np.float32)

    ref_out = ref_sample_euler(ref_cond, torch.tensor(x_init),
                               torch.tensor(np.asarray(sigmas)), disable=True)

    # ours
    mask = ref_op.mask.numpy()[0].transpose(1, 2, 0)
    my_op = kops.InpaintingOperator(sigma_s=jnp.float32(0.05),
                                    mask=jnp.asarray(mask))
    meas = kops.Measurement(y=jnp.asarray(ref_meas[0].numpy().transpose(0, 2, 3, 1)))
    cfg = guidance.GuidanceConfig(guidance=guidance_name, x0_cov_type=cov,
                                  cg_maxiter=1000, **extra)

    def model_apply(p, x, t):
        return flax_model.apply({"params": p}, x, t.astype(jnp.float32))

    uncond, var_fn = guidance.make_openai_uncond(model_apply, tables, cfg)
    denoise = guidance.make_condition_denoiser(uncond, var_fn, my_op, meas, cfg,
                                               params=params)
    our_out = samplers.sample_euler(
        lambda x, s, k: denoise(x, s, k),
        jnp.asarray(x_init.transpose(0, 2, 3, 1)), sigmas, jax.random.key(0))

    np.testing.assert_allclose(np.asarray(our_out).transpose(0, 3, 1, 2),
                               ref_out.detach().numpy(), atol=2e-2, rtol=5e-2)


def test_full_heun_blur_trajectory_parity(reference_path, stack):
    """Heun ODE with Type-II + gaussian blur — second-order sampler through
    the FFT closed-form + CG paths."""
    import torch
    from condition.condition import ConditionOpenAIDenoiser
    from k_diffusion.sampling import sample_heun as ref_sample_heun
    from kdip_tpu.ops import kernels as okernels

    torch_unet, diff_ref, flax_model, params, tables = stack
    kernel = okernels.gaussian_kernel(9, 2.0)

    from condition.measurements import GaussialBlurOperator
    ref_op = GaussialBlurOperator.__new__(GaussialBlurOperator)
    ref_op.device = "cpu"
    ref_op.kernel_size = 9
    ref_op.kernel = torch.tensor(kernel.astype(np.float32))
    ref_op.sigma_s = torch.Tensor([0.05])
    ref_op.in_shape = (1, 3, SIZE, SIZE)

    rng = np.random.RandomState(1)
    x0 = rng.rand(1, 3, SIZE, SIZE).astype(np.float32) * 2 - 1
    torch.manual_seed(1)
    ref_meas = ref_op.forward(torch.tensor(x0).clone(), flatten=True)
    ref_cond = ConditionOpenAIDenoiser(
        inner_model=torch_unet, diffusion=diff_ref, operator=ref_op,
        measurement=ref_meas, guidance="II", x0_cov_type="convert",
        recon_mse=None, device="cpu").eval()

    sigmas = schedules.get_sigmas_karras(STEPS, 0.01, 80.0)
    x_init = (rng.randn(1, 3, SIZE, SIZE) * 80.0).astype(np.float32)
    ref_out = ref_sample_heun(ref_cond, torch.tensor(x_init),
                              torch.tensor(np.asarray(sigmas)), disable=True)

    my_op = kops.get_operator("gaussian_blur", in_shape=(1, 3, SIZE, SIZE),
                              sigma_s=0.05, kernel=kernel)
    meas = my_op.finalize(jnp.asarray(ref_meas[0].numpy().transpose(0, 2, 3, 1)))
    cfg = guidance.GuidanceConfig(guidance="II", x0_cov_type="convert",
                                  cg_maxiter=1000)

    def model_apply(p, x, t):
        return flax_model.apply({"params": p}, x, t.astype(jnp.float32))

    uncond, var_fn = guidance.make_openai_uncond(model_apply, tables, cfg)
    denoise = guidance.make_condition_denoiser(uncond, var_fn, my_op, meas, cfg,
                                               params=params)
    our_out = samplers.sample_heun(
        lambda x, s, k: denoise(x, s, k),
        jnp.asarray(x_init.transpose(0, 2, 3, 1)), sigmas, jax.random.key(0))

    np.testing.assert_allclose(np.asarray(our_out).transpose(0, 3, 1, 2),
                               ref_out.detach().numpy(), atol=2e-2, rtol=5e-2)
