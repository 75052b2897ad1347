"""STSL guidance numerical parity vs the reference, with injected fixed
Hutchinson probes (VERDICT r1 weak #5), plus +mle switchover boundary parity
(condition.py:110-126 two-sided Python branch vs our lax.cond).

Probe injection: the reference draws `torch.randn_like(x)` inside
`_stsl_guidance_impl` (condition.py:185-208); ours draws
`jax.random.normal(fold_in(key, i))`. Both are monkeypatched to pop the same
pinned probe sequence, making the two implementations deterministic and
comparable call-for-call.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu import ckpt, diffusion, guidance
from kdip_tpu import operators as kops
from kdip_tpu.models import adm

SIZE = 16
N_HUTCH = 2


@pytest.fixture(scope="module")
def stack(reference_path):
    import torch
    from guided_diffusion.script_util import create_gaussian_diffusion
    from guided_diffusion.unet import UNetModel

    torch.manual_seed(0)
    torch_unet = UNetModel(image_size=SIZE, in_channels=3, model_channels=32,
                           out_channels=6, num_res_blocks=1,
                           attention_resolutions={2}, dropout=0.0,
                           channel_mult=(1, 2), num_heads=4,
                           num_head_channels=16, use_scale_shift_norm=True,
                           resblock_updown=True).eval()
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

    np.random.seed(0)
    from condition.measurements import get_operator as ref_get_operator
    ref_op = ref_get_operator(name="inpainting", device="cpu", sigma_s=0.05,
                              mask_opt=dict(mask_type="random",
                                            mask_prob_range=(0.5, 0.5),
                                            image_size=SIZE))
    rng = np.random.RandomState(1)
    x0 = rng.rand(1, 3, SIZE, SIZE).astype(np.float32) * 2 - 1
    torch.manual_seed(1)
    ref_meas = ref_op.forward(torch.tensor(x0).clone(), flatten=True)

    mask = ref_op.mask.numpy()[0].transpose(1, 2, 0)
    my_op = kops.InpaintingOperator(sigma_s=jnp.float32(0.05),
                                    mask=jnp.asarray(mask))
    meas = kops.Measurement(
        y=jnp.asarray(ref_meas[0].numpy().transpose(0, 2, 3, 1)))
    return torch_unet, diff_ref, flax_model, params, tables, ref_op, ref_meas, \
        my_op, meas


def _build_pair(stack, guidance_name, monkeypatch, probes_nchw):
    """Returns (ref_call, our_call): denoiser closures with pinned probes."""
    import torch
    from condition import condition as ref_condition
    from condition.condition import ConditionOpenAIDenoiser

    (torch_unet, diff_ref, flax_model, params, tables, ref_op, ref_meas,
     my_op, meas) = stack

    ref_cond = ConditionOpenAIDenoiser(
        inner_model=torch_unet, diffusion=diff_ref, operator=ref_op,
        measurement=ref_meas, guidance=guidance_name, x0_cov_type="convert",
        recon_mse=None, device="cpu", zeta=0.3, eta=0.7,
        num_hutchinson_samples=N_HUTCH).eval()

    ref_queue = []

    def fake_randn_like(t):
        return torch.tensor(ref_queue.pop(0))

    # the reference module binds `torch` at module level
    monkeypatch.setattr(ref_condition.torch, "randn_like", fake_randn_like,
                        raising=True)

    cfg = guidance.GuidanceConfig(guidance=guidance_name,
                                  x0_cov_type="convert", zeta=0.3, eta=0.7,
                                  num_hutchinson_samples=N_HUTCH,
                                  cg_maxiter=1000)

    def model_apply(p, x, t):
        return flax_model.apply({"params": p}, x, t.astype(jnp.float32))

    uncond, var_fn = guidance.make_openai_uncond(model_apply, tables, cfg)
    denoise = guidance.make_condition_denoiser(uncond, var_fn, my_op, meas,
                                               cfg, params=params)

    our_queue = []
    real_normal = jax.random.normal

    def fake_normal(key, shape=(), dtype=float):
        if our_queue:
            return jnp.asarray(our_queue.pop(0).transpose(0, 2, 3, 1),
                               dtype=dtype)
        return real_normal(key, shape, dtype)

    monkeypatch.setattr(jax.random, "normal", fake_normal, raising=True)

    def ref_call(x_nchw, sigma):
        ref_queue.clear()
        ref_queue.extend([p.copy() for p in probes_nchw])
        return ref_cond(torch.tensor(x_nchw),
                        torch.tensor([sigma])).detach().numpy()

    def our_call(x_nchw, sigma):
        our_queue.clear()
        our_queue.extend([p.copy() for p in probes_nchw])
        out = denoise(jnp.asarray(x_nchw.transpose(0, 2, 3, 1)),
                      jnp.float32(sigma), jax.random.key(0))
        return np.asarray(out).transpose(0, 3, 1, 2)

    return ref_call, our_call


@pytest.mark.parametrize("sigma", [0.05, 0.5, 3.0])
def test_stsl_single_call_parity(reference_path, stack, monkeypatch, sigma):
    rng = np.random.RandomState(2)
    probes = [rng.randn(1, 3, SIZE, SIZE).astype(np.float32)
              for _ in range(N_HUTCH)]
    ref_call, our_call = _build_pair(stack, "stsl", monkeypatch, probes)
    x = (rng.randn(1, 3, SIZE, SIZE) * sigma).astype(np.float32)
    ref_out = ref_call(x, sigma)
    our_out = our_call(x, sigma)
    np.testing.assert_allclose(our_out, ref_out, atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("guidance_name", ["stsl+mle", "dps+mle", "pgdm+mle"])
@pytest.mark.parametrize("side", [-1.0, 1.0])
def test_mle_switchover_boundary_parity(reference_path, stack, monkeypatch,
                                        guidance_name, side):
    """sigma straddling mle_sigma_thres=0.2 by 1e-3 on each side: the Python
    `if` (ref condition.py:110-126) and our lax.cond must pick the same
    branch and agree numerically."""
    sigma = 0.2 * (1.0 + side * 5e-3)
    rng = np.random.RandomState(3)
    probes = [rng.randn(1, 3, SIZE, SIZE).astype(np.float32)
              for _ in range(N_HUTCH)]
    ref_call, our_call = _build_pair(stack, guidance_name, monkeypatch, probes)
    x = (rng.randn(1, 3, SIZE, SIZE) * sigma).astype(np.float32)
    ref_out = ref_call(x, sigma)
    our_out = our_call(x, sigma)
    np.testing.assert_allclose(our_out, ref_out, atol=2e-3, rtol=1e-3)
