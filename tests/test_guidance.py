"""End-to-end guidance parity vs the reference ConditionOpenAIDenoiser.

The strongest test in the suite: a small torch ADM UNet is instantiated with
random init, its weights converted to our Flax model, and both conditioning
stacks (uncond_pred -> covariance -> mat solver -> guidance score) are run on
identical inputs/measurements. Agreement here covers sigma_to_t, the
p_mean_variance chain, Eq.(22), the FFT/CG mat solvers, and the vjp guidance
scores all at once.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu import ckpt, diffusion, guidance
from kdip_tpu import operators as kops
from kdip_tpu.models import adm

SIZE = 32


@pytest.fixture(scope="module")
def stack(reference_path):
    """Builds (torch_unet, spaced_diffusion, flax_model, flax_params, tables)."""
    import torch
    from guided_diffusion.unet import UNetModel
    from guided_diffusion.script_util import create_gaussian_diffusion

    torch.manual_seed(0)
    kw = dict(image_size=SIZE, in_channels=3, model_channels=32, out_channels=6,
              num_res_blocks=1, attention_resolutions={2}, dropout=0.0,
              channel_mult=(1, 2), num_heads=4, num_head_channels=16,
              use_scale_shift_norm=True, resblock_updown=True)
    torch_unet = UNetModel(**kw).eval()
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


def _model_apply(flax_model):
    def apply(params, x_scaled, t):
        return flax_model.apply({"params": params}, x_scaled, t.astype(jnp.float32))
    return apply


def _make_ref_cond(reference_path, torch_unet, diff_ref, operator, measurement,
                   guidance_name, cov_type, recon_mse=None, **kw):
    from condition.condition import ConditionOpenAIDenoiser
    return ConditionOpenAIDenoiser(
        inner_model=torch_unet, diffusion=diff_ref, operator=operator,
        measurement=measurement, guidance=guidance_name, x0_cov_type=cov_type,
        recon_mse=recon_mse, device="cpu", **kw).eval()


def _ref_inpaint_op(reference_path):
    """Reference inpainting operator at 32px with a fixed mask."""
    from condition.measurements import get_operator as ref_get_operator
    np.random.seed(0)
    op = ref_get_operator(name="inpainting", device="cpu", sigma_s=0.05,
                          mask_opt=dict(mask_type="random",
                                        mask_prob_range=(0.5, 0.5),
                                        image_size=SIZE))
    return op


def _ref_blur_op(reference_path, kernel):
    import torch
    from condition.measurements import GaussialBlurOperator
    op = GaussialBlurOperator.__new__(GaussialBlurOperator)
    op.device = "cpu"
    op.kernel_size = kernel.shape[0]
    op.kernel = torch.tensor(kernel.astype(np.float32))
    op.sigma_s = torch.Tensor([0.05])
    op.in_shape = (1, 3, SIZE, SIZE)
    return op


_GUIDANCE_CASES = [
    ("I", "convert", {}),          # CG path (tensor covariance)
    ("I", "pgdm", {}),             # closed-form path (scalar covariance)
    ("II", "convert", {}),
    ("dps", "dps", {"zeta": 1.0}),
    ("pgdm", "pgdm", {}),
    ("diffpir", "diffpir", {"lambda_": 10.0}),
    ("I", "tmpd", {}),
    ("uncond", "convert", {}),
]


@pytest.mark.parametrize("guidance_name,cov_type,extra", _GUIDANCE_CASES)
def test_guidance_parity_inpainting(reference_path, stack, guidance_name,
                                    cov_type, extra):
    import torch
    torch_unet, diff_ref, flax_model, params, tables = stack
    ref_op = _ref_inpaint_op(reference_path)

    rng = np.random.RandomState(0)
    x0 = rng.rand(1, 3, SIZE, SIZE).astype(np.float32) * 2 - 1
    torch.manual_seed(1)
    ref_meas = ref_op.forward(torch.tensor(x0).clone(), flatten=True)

    ref_cond = _make_ref_cond(reference_path, torch_unet, diff_ref, ref_op,
                              ref_meas, guidance_name, cov_type, **extra)

    # ours: same mask, same y
    mask = ref_op.mask.numpy()[0].transpose(1, 2, 0)
    my_op = kops.InpaintingOperator(sigma_s=jnp.float32(0.05),
                                    mask=jnp.asarray(mask))
    y = jnp.asarray(ref_meas[0].numpy().transpose(0, 2, 3, 1))
    meas = kops.Measurement(y=y)

    cfg = guidance.GuidanceConfig(guidance=guidance_name, x0_cov_type=cov_type,
                                  cg_maxiter=1000, **extra)
    uncond, var_fn = guidance.make_openai_uncond(_model_apply(flax_model),
                                                 tables, cfg)
    denoise = guidance.make_condition_denoiser(uncond, var_fn, my_op, meas, cfg,
                                               params=params)

    for sigma in [0.1, 1.7]:
        x = rng.randn(1, 3, SIZE, SIZE).astype(np.float32) * sigma
        ref_out = ref_cond(torch.tensor(x), torch.tensor([sigma]))
        our_out = denoise(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.float32(sigma),
                          jax.random.key(0))
        np.testing.assert_allclose(np.asarray(our_out).transpose(0, 3, 1, 2),
                                   ref_out.detach().numpy(), atol=5e-3, rtol=1e-2,
                                   err_msg=f"sigma={sigma}")


@pytest.mark.parametrize("guidance_name,cov_type,extra", [
    ("I", "convert", {}),
    ("II", "convert", {}),
    ("pgdm", "pgdm", {}),
    ("diffpir", "diffpir", {"lambda_": 10.0}),
])
def test_guidance_parity_gaussian_blur(reference_path, stack, guidance_name,
                                       cov_type, extra):
    import torch
    torch_unet, diff_ref, flax_model, params, tables = stack
    from kdip_tpu.ops import kernels as okernels
    kernel = okernels.gaussian_kernel(9, 2.0)
    ref_op = _ref_blur_op(reference_path, kernel)

    rng = np.random.RandomState(0)
    x0 = rng.rand(1, 3, SIZE, SIZE).astype(np.float32) * 2 - 1
    torch.manual_seed(1)
    ref_meas = ref_op.forward(torch.tensor(x0).clone(), flatten=True)

    ref_cond = _make_ref_cond(reference_path, torch_unet, diff_ref, ref_op,
                              ref_meas, guidance_name, cov_type, **extra)

    my_op = kops.get_operator("gaussian_blur", in_shape=(1, 3, SIZE, SIZE),
                              sigma_s=0.05, kernel=kernel)
    y = jnp.asarray(ref_meas[0].numpy().transpose(0, 2, 3, 1))
    meas = my_op.finalize(y)

    cfg = guidance.GuidanceConfig(guidance=guidance_name, x0_cov_type=cov_type,
                                  cg_maxiter=1000, **extra)
    uncond, var_fn = guidance.make_openai_uncond(_model_apply(flax_model),
                                                 tables, cfg)
    denoise = guidance.make_condition_denoiser(uncond, var_fn, my_op, meas, cfg,
                                               params=params)

    for sigma in [0.1, 1.7]:
        x = rng.randn(1, 3, SIZE, SIZE).astype(np.float32) * sigma
        ref_out = ref_cond(torch.tensor(x), torch.tensor([sigma]))
        our_out = denoise(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.float32(sigma),
                          jax.random.key(0))
        np.testing.assert_allclose(np.asarray(our_out).transpose(0, 3, 1, 2),
                                   ref_out.detach().numpy(), atol=5e-3, rtol=1e-2,
                                   err_msg=f"sigma={sigma}")


def test_analytic_covariance_parity(reference_path, stack):
    """analytic cov: nearest-sigma MSE lookup (condition.py:250-256)."""
    import torch
    torch_unet, diff_ref, flax_model, params, tables = stack
    ref_op = _ref_inpaint_op(reference_path)
    rng = np.random.RandomState(0)
    x0 = rng.rand(1, 3, SIZE, SIZE).astype(np.float32) * 2 - 1
    torch.manual_seed(1)
    ref_meas = ref_op.forward(torch.tensor(x0).clone(), flatten=True)

    sig_grid = np.geomspace(0.01, 80, 64).astype(np.float32)
    mse = (0.1 * sig_grid / (1 + sig_grid)).astype(np.float32)
    ref_mse = {"sigmas": torch.tensor(sig_grid), "mse_list": torch.tensor(mse)}
    our_mse = {"sigmas": jnp.asarray(sig_grid), "mse_list": jnp.asarray(mse)}

    ref_cond = _make_ref_cond(reference_path, torch_unet, diff_ref, ref_op,
                              ref_meas, "I", "analytic", recon_mse=ref_mse)
    mask = ref_op.mask.numpy()[0].transpose(1, 2, 0)
    my_op = kops.InpaintingOperator(sigma_s=jnp.float32(0.05),
                                    mask=jnp.asarray(mask))
    meas = kops.Measurement(y=jnp.asarray(ref_meas[0].numpy().transpose(0, 2, 3, 1)))
    cfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="analytic",
                                  cg_maxiter=1000)
    uncond, var_fn = guidance.make_openai_uncond(_model_apply(flax_model),
                                                 tables, cfg, recon_mse=our_mse)
    denoise = guidance.make_condition_denoiser(uncond, var_fn, my_op, meas, cfg,
                                               params=params)
    for sigma in [0.05, 1.0]:
        x = rng.randn(1, 3, SIZE, SIZE).astype(np.float32) * sigma
        ref_out = ref_cond(torch.tensor(x), torch.tensor([sigma]))
        our_out = denoise(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.float32(sigma),
                          jax.random.key(0))
        np.testing.assert_allclose(np.asarray(our_out).transpose(0, 3, 1, 2),
                                   ref_out.detach().numpy(), atol=5e-3, rtol=1e-2)


def test_mle_switch(reference_path, stack):
    """dps+mle switches to type-I below the sigma threshold
    (condition.py:110-114)."""
    import torch
    torch_unet, diff_ref, flax_model, params, tables = stack
    ref_op = _ref_inpaint_op(reference_path)
    rng = np.random.RandomState(0)
    x0 = rng.rand(1, 3, SIZE, SIZE).astype(np.float32) * 2 - 1
    torch.manual_seed(1)
    ref_meas = ref_op.forward(torch.tensor(x0).clone(), flatten=True)
    ref_cond = _make_ref_cond(reference_path, torch_unet, diff_ref, ref_op,
                              ref_meas, "dps+mle", "convert", zeta=1.0)
    mask = ref_op.mask.numpy()[0].transpose(1, 2, 0)
    my_op = kops.InpaintingOperator(sigma_s=jnp.float32(0.05),
                                    mask=jnp.asarray(mask))
    meas = kops.Measurement(y=jnp.asarray(ref_meas[0].numpy().transpose(0, 2, 3, 1)))
    cfg = guidance.GuidanceConfig(guidance="dps+mle", x0_cov_type="convert",
                                  zeta=1.0, cg_maxiter=1000)
    uncond, var_fn = guidance.make_openai_uncond(_model_apply(flax_model),
                                                 tables, cfg)
    denoise = guidance.make_condition_denoiser(uncond, var_fn, my_op, meas, cfg,
                                               params=params)
    for sigma in [0.05, 1.0]:  # below / above mle_sigma_thres=0.2
        x = rng.randn(1, 3, SIZE, SIZE).astype(np.float32) * sigma
        ref_out = ref_cond(torch.tensor(x), torch.tensor([sigma]))
        our_out = denoise(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.float32(sigma),
                          jax.random.key(0))
        np.testing.assert_allclose(np.asarray(our_out).transpose(0, 3, 1, 2),
                                   ref_out.detach().numpy(), atol=5e-3, rtol=1e-2)


def test_guidance_batched():
    """Batching (the reference asserts batch==1; we support B>1 natively)."""
    tables = diffusion.make_diffusion(1000, "linear")
    model = adm.ADMUNet(image_size=16, model_channels=32, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_heads=2, num_head_channels=16, out_channels=6)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,)))["params"]
    mask = kops.generate_mask(mask_type="random", mask_prob_range=(0.5, 0.5),
                              image_size=16, seed=0)
    op = kops.InpaintingOperator(sigma_s=jnp.float32(0.05), mask=jnp.asarray(mask))
    x0 = jax.random.uniform(jax.random.key(1), (3, 16, 16, 3)) * 2 - 1
    meas = op.measure(x0, jax.random.key(2))
    cfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="convert")

    def model_apply(params, x, t):
        return model.apply({"params": params}, x, t.astype(jnp.float32))

    uncond, var_fn = guidance.make_openai_uncond(model_apply, tables, cfg)
    denoise = guidance.make_condition_denoiser(uncond, var_fn, op, meas, cfg,
                                               params=params)
    x = jax.random.normal(jax.random.key(3), (3, 16, 16, 3))
    out = jax.jit(denoise)(x, jnp.float32(1.0), jax.random.key(4))
    assert out.shape == (3, 16, 16, 3)
    assert bool(jnp.isfinite(out).all())


def test_stsl_runs():
    """STSL guidance executes under jit (no reference parity: its Hutchinson
    samples are RNG-dependent)."""
    tables = diffusion.make_diffusion(1000, "linear")
    model = adm.ADMUNet(image_size=16, model_channels=32, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_heads=2, num_head_channels=16, out_channels=6)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,)))["params"]
    mask = kops.generate_mask(mask_type="random", mask_prob_range=(0.5, 0.5),
                              image_size=16, seed=0)
    op = kops.InpaintingOperator(sigma_s=jnp.float32(0.05), mask=jnp.asarray(mask))
    x0 = jax.random.uniform(jax.random.key(1), (1, 16, 16, 3)) * 2 - 1
    meas = op.measure(x0, jax.random.key(2))
    cfg = guidance.GuidanceConfig(guidance="stsl", x0_cov_type="convert",
                                  zeta=1.0, eta=1.0, num_hutchinson_samples=2)

    def model_apply(params, x, t):
        return model.apply({"params": params}, x, t.astype(jnp.float32))

    uncond, var_fn = guidance.make_openai_uncond(model_apply, tables, cfg)
    denoise = guidance.make_condition_denoiser(uncond, var_fn, op, meas, cfg,
                                               params=params)
    out = jax.jit(denoise)(jax.random.normal(jax.random.key(3), (1, 16, 16, 3)),
                           jnp.float32(1.0), jax.random.key(4))
    assert bool(jnp.isfinite(out).all())


def test_autoi_runs():
    """autoI guidance executes and moves the estimate toward the measurement."""
    tables = diffusion.make_diffusion(1000, "linear")
    model = adm.ADMUNet(image_size=16, model_channels=32, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_heads=2, num_head_channels=16, out_channels=6)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,)))["params"]
    mask = kops.generate_mask(mask_type="random", mask_prob_range=(0.5, 0.5),
                              image_size=16, seed=0)
    op = kops.InpaintingOperator(sigma_s=jnp.float32(0.05), mask=jnp.asarray(mask))
    x0 = jax.random.uniform(jax.random.key(1), (1, 16, 16, 3)) * 2 - 1
    meas = op.measure(x0, jax.random.key(2))
    cfg = guidance.GuidanceConfig(guidance="autoI", x0_cov_type="convert",
                                  num_probes=4)

    def model_apply(params, x, t):
        return model.apply({"params": params}, x, t.astype(jnp.float32))

    uncond, var_fn = guidance.make_openai_uncond(model_apply, tables, cfg)
    denoise = guidance.make_condition_denoiser(uncond, var_fn, op, meas, cfg,
                                               params=params)
    out = jax.jit(denoise)(jax.random.normal(jax.random.key(3), (1, 16, 16, 3)),
                           jnp.float32(0.5), jax.random.key(4))
    assert bool(jnp.isfinite(out).all())
