"""Guidance parity for the super-resolution operator (the pinned bicubic
.mat kernel + exact Resizer forward + FFT-kernel solver path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu import ckpt, diffusion, guidance
from kdip_tpu import operators as kops
from kdip_tpu.models import adm
from kdip_tpu.ops import kernels as okernels

SIZE = 32
SF = 4
MAT_PATH = "/root/reference/condition/kernels/kernels_bicubicx234.mat"


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


def _ref_sr_op(reference_path):
    """Builds the reference SR operator without its cwd-relative .mat load
    (measurements.py:86-101), injecting the pinned kernel directly."""
    import torch
    from condition.measurements import SuperResolutionOperator
    from condition.dps_utils.resizer import Resizer
    from functools import partial
    import torch.nn.functional as F

    op = SuperResolutionOperator.__new__(SuperResolutionOperator)
    op.device = "cpu"
    op.up_sample = partial(F.interpolate, scale_factor=SF)
    op.down_sample = Resizer((1, 3, SIZE, SIZE), 1 / SF)
    op.scale_factor = SF
    op.sigma_s = torch.Tensor([0.05])
    op.kernel = torch.tensor(okernels.load_bicubic_mat(MAT_PATH, SF))
    op.in_shape = (1, 3, SIZE, SIZE)
    op.out_shape = (1, 3, SIZE // SF, SIZE // SF)
    return op


@pytest.mark.parametrize("guidance_name,cov,extra", [
    ("I", "convert", {}),            # CG path
    ("I", "pgdm", {}),               # closed-form path
    ("II", "convert", {}),
    ("diffpir", "diffpir", {"lambda_": 10.0}),
])
def test_sr_guidance_parity(reference_path, stack, guidance_name, cov, extra):
    import torch
    from condition.condition import ConditionOpenAIDenoiser

    torch_unet, diff_ref, flax_model, params, tables = stack
    ref_op = _ref_sr_op(reference_path)

    rng = np.random.RandomState(0)
    x0 = rng.rand(1, 3, SIZE, SIZE).astype(np.float32) * 2 - 1
    torch.manual_seed(1)
    ref_meas = ref_op.forward(torch.tensor(x0).clone(), flatten=True)
    ref_cond = ConditionOpenAIDenoiser(
        inner_model=torch_unet, diffusion=diff_ref, operator=ref_op,
        measurement=ref_meas, guidance=guidance_name, x0_cov_type=cov,
        recon_mse=None, device="cpu", **extra).eval()

    my_op = kops.get_operator("super_resolution", in_shape=(1, 3, SIZE, SIZE),
                              scale_factor=SF, sigma_s=0.05,
                              kernel_path=MAT_PATH)
    y = jnp.asarray(ref_meas[0].numpy().transpose(0, 2, 3, 1))
    meas = my_op.finalize(y)

    cfg = guidance.GuidanceConfig(guidance=guidance_name, x0_cov_type=cov,
                                  cg_maxiter=1000, **extra)

    def model_apply(p, x, t):
        return flax_model.apply({"params": p}, x, t.astype(jnp.float32))

    uncond, var_fn = guidance.make_openai_uncond(model_apply, tables, cfg)
    denoise = guidance.make_condition_denoiser(uncond, var_fn, my_op, meas, cfg,
                                               params=params)
    for sigma in [0.1, 1.7]:
        x = rng.randn(1, 3, SIZE, SIZE).astype(np.float32) * sigma
        ref_out = ref_cond(torch.tensor(x), torch.tensor([sigma]))
        our_out = denoise(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.float32(sigma),
                          jax.random.key(0))
        np.testing.assert_allclose(np.asarray(our_out).transpose(0, 3, 1, 2),
                                   ref_out.detach().numpy(), atol=8e-3, rtol=2e-2,
                                   err_msg=f"sigma={sigma}")


def test_sr_forward_and_transpose_parity(reference_path):
    """A (exact Resizer) and A^T (FFT kernel) match the reference."""
    import torch
    ref_op = _ref_sr_op(reference_path)
    my_op = kops.get_operator("super_resolution", in_shape=(1, 3, SIZE, SIZE),
                              scale_factor=SF, sigma_s=0.05,
                              kernel_path=MAT_PATH)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, SIZE, SIZE).astype(np.float32)
    ref_y = ref_op.forward(torch.tensor(x), noiseless=True).numpy()
    our_y = np.asarray(my_op.forward(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(our_y.transpose(0, 3, 1, 2), ref_y, rtol=1e-3,
                               atol=1e-5)
    yl = rng.randn(1, 3, SIZE // SF, SIZE // SF).astype(np.float32)
    ref_x = ref_op.transpose(torch.tensor(yl)).numpy()
    our_x = np.asarray(my_op.transpose(jnp.asarray(yl.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(our_x.transpose(0, 3, 1, 2), ref_x, rtol=1e-3,
                               atol=1e-5)
