"""Parity for the V2 learned-covariance path (ConditionOpenAIDenoiserV2):
UNet + out_cov variance head -> (x0_mean, logvar, logvar_ot) -> Type I/II
guidance with DCT-diagonal covariance, vs the reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu import ckpt, diffusion, guidance
from kdip_tpu import operators as kops
from kdip_tpu.models import adm

SIZE = 32


@pytest.fixture(scope="module")
def v2_stack(reference_path):
    import torch
    from guided_diffusion.unet import UNetModel
    from guided_diffusion.script_util import create_gaussian_diffusion
    from k_diffusion.external import OpenAIDenoiserV2

    torch.manual_seed(0)
    torch_unet = UNetModel(image_size=SIZE, in_channels=3, model_channels=32,
                           out_channels=6, num_res_blocks=1,
                           attention_resolutions={2}, dropout=0.0,
                           channel_mult=(1, 2), num_heads=4, num_head_channels=16,
                           use_scale_shift_norm=True, resblock_updown=True).eval()
    diff_ref = create_gaussian_diffusion(steps=1000, learn_sigma=True,
                                         noise_schedule="linear")
    # the V2 wrapper owns the out_cov head (external.py:141); its input is
    # the penultimate feature map (32 ch for this config, 128 for FFHQ)
    ref_v2 = OpenAIDenoiserV2(torch_unet, diff_ref, device="cpu",
                              ortho_tf_type="dct")
    ref_v2.out_cov = torch.nn.Conv2d(32, 6, 1)
    torch.manual_seed(1)
    torch.nn.init.normal_(ref_v2.out_cov.weight, std=0.05)
    torch.nn.init.normal_(ref_v2.out_cov.bias, std=0.05)
    ref_v2 = ref_v2.eval()

    flax_unet = adm.ADMUNet(image_size=SIZE, in_channels=3, model_channels=32,
                            out_channels=6, num_res_blocks=1,
                            attention_resolutions=(2,), dropout=0.0,
                            channel_mult=(1, 2), num_heads=4,
                            num_head_channels=16, use_scale_shift_norm=True,
                            resblock_updown=True)
    flax_v2 = adm.ADMUNetV2(unet=flax_unet)
    params = {
        "unet": ckpt.convert_adm_state_dict(torch_unet.state_dict()),
        "out_cov": ckpt.convert_v2_out_cov(
            {"out_cov.weight": ref_v2.out_cov.weight.detach(),
             "out_cov.bias": ref_v2.out_cov.bias.detach()}),
    }
    tables = diffusion.make_diffusion(1000, "linear")
    return ref_v2, flax_v2, params, tables


def test_v2_forward_parity(reference_path, v2_stack):
    """(eps, logvar, logvar_ot) triple matches OpenAIDenoiserV2.forward
    (external.py:161-169)."""
    import torch
    ref_v2, flax_v2, params, tables = v2_stack
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, SIZE, SIZE).astype(np.float32)
    sigma = 0.7
    ref_out, ref_lv, ref_lvot = ref_v2(torch.tensor(x), torch.tensor([sigma]),
                                       return_variance=True)

    from kdip_tpu import precond
    c_out, c_in = precond.eps_scalings(jnp.float32(sigma))
    t = precond.sigma_to_t(tables.log_sigmas, jnp.float32(sigma))
    eps, lv, lvot = flax_v2.apply({"params": params},
                                  jnp.asarray(x.transpose(0, 2, 3, 1)) * c_in,
                                  jnp.broadcast_to(t, (1,)))
    np.testing.assert_allclose(np.asarray(eps).transpose(0, 3, 1, 2),
                               ref_out.detach().numpy(), atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(lv).transpose(0, 3, 1, 2),
                               ref_lv.detach().numpy(), atol=3e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(lvot).transpose(0, 3, 1, 2),
                               ref_lvot.detach().numpy(), atol=3e-3, rtol=1e-2)


@pytest.mark.parametrize("guidance_name", ["I", "II"])
@pytest.mark.parametrize("sigma", [0.1, 1.5])  # below / above mle threshold
def test_v2_guidance_parity(reference_path, v2_stack, guidance_name, sigma):
    import torch
    from condition.condition import ConditionOpenAIDenoiserV2
    ref_v2, flax_v2, params, tables = v2_stack

    np.random.seed(0)
    from condition.measurements import get_operator as ref_get_operator
    ref_op = ref_get_operator(name="inpainting", device="cpu", sigma_s=0.05,
                              mask_opt=dict(mask_type="random",
                                            mask_prob_range=(0.5, 0.5),
                                            image_size=SIZE))
    rng = np.random.RandomState(0)
    x0 = rng.rand(1, 3, SIZE, SIZE).astype(np.float32) * 2 - 1
    torch.manual_seed(1)
    ref_meas = ref_op.forward(torch.tensor(x0).clone(), flatten=True)

    ref_cond = ConditionOpenAIDenoiserV2(
        denoiser=ref_v2, operator=ref_op, measurement=ref_meas,
        guidance=guidance_name, device="cpu", ortho_tf_type="dct").eval()

    mask = ref_op.mask.numpy()[0].transpose(1, 2, 0)
    my_op = kops.InpaintingOperator(sigma_s=jnp.float32(0.05),
                                    mask=jnp.asarray(mask))
    meas = kops.Measurement(y=jnp.asarray(ref_meas[0].numpy().transpose(0, 2, 3, 1)))
    cfg = guidance.GuidanceConfig(guidance=guidance_name, x0_cov_type="convert",
                                  ortho_tf_type="dct", cg_maxiter=1000)

    def model_apply_v2(p, x_scaled, t):
        return flax_v2.apply({"params": p}, x_scaled,
                             jnp.broadcast_to(t, (x_scaled.shape[0],)))

    uncond, var_fn = guidance.make_openai_v2_uncond(model_apply_v2, tables, cfg)
    denoise = guidance.make_condition_denoiser(uncond, var_fn, my_op, meas, cfg,
                                               params=params, v2=True)

    x = rng.randn(1, 3, SIZE, SIZE).astype(np.float32) * sigma
    ref_out = ref_cond(torch.tensor(x), torch.tensor([sigma]))
    our_out = denoise(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.float32(sigma),
                      jax.random.key(0))
    # NCHW-vs-NHWC DCT axis order is immaterial (separable over all axes);
    # CG solvers differ slightly.
    np.testing.assert_allclose(np.asarray(our_out).transpose(0, 3, 1, 2),
                               ref_out.detach().numpy(), atol=8e-3, rtol=2e-2)


def test_v2_spatial_var_guidance_runs():
    """--spatial-var path (ortho_tf None, sample_condition_openai_v2.py:163)."""
    tables = diffusion.make_diffusion(1000, "linear")
    unet = adm.ADMUNet(image_size=16, model_channels=32, num_res_blocks=1,
                       attention_resolutions=(2,), channel_mult=(1, 2),
                       num_heads=2, num_head_channels=16, out_channels=6)
    model = adm.ADMUNetV2(unet=unet)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,)))["params"]
    mask = kops.generate_mask(mask_type="random", mask_prob_range=(0.5, 0.5),
                              image_size=16, seed=0)
    op = kops.InpaintingOperator(sigma_s=jnp.float32(0.05), mask=jnp.asarray(mask))
    x0 = jax.random.uniform(jax.random.key(1), (1, 16, 16, 3)) * 2 - 1
    meas = op.measure(x0, jax.random.key(2))
    cfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="convert",
                                  ortho_tf_type=None)

    def model_apply_v2(p, x_scaled, t):
        return model.apply({"params": p}, x_scaled,
                           jnp.broadcast_to(t, (x_scaled.shape[0],)))

    uncond, var_fn = guidance.make_openai_v2_uncond(model_apply_v2, tables, cfg)
    denoise = guidance.make_condition_denoiser(uncond, var_fn, op, meas, cfg,
                                               params=params, v2=True)
    out = jax.jit(denoise)(jax.random.normal(jax.random.key(3), (1, 16, 16, 3)),
                           jnp.float32(0.1), jax.random.key(4))
    assert bool(jnp.isfinite(out).all())
