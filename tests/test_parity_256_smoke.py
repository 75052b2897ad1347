"""Production-scale parity smoke: one guided ODE step at 256 px with the
full FFHQ 93.6M-param architecture vs the torch reference (the full
operator x guidance matrix lives in scripts/parity_256.py -> RESULTS_256.json;
this keeps one configuration as a fast-ish regression guard)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu import ckpt, diffusion, guidance, samplers, schedules
from kdip_tpu import operators as kops
from kdip_tpu.models import adm

SIZE = 256


@pytest.mark.slow
def test_256px_inpainting_convert_one_step(reference_path):
    import torch
    from condition.condition import ConditionOpenAIDenoiser
    from condition.measurements import get_operator as ref_get_operator
    from guided_diffusion.script_util import (create_model_and_diffusion,
                                              model_and_diffusion_defaults)
    from k_diffusion.sampling import sample_euler as ref_sample_euler

    torch.manual_seed(0)
    flags = model_and_diffusion_defaults()
    flags.update(dict(image_size=SIZE, num_channels=128, num_res_blocks=1,
                      attention_resolutions="16", dropout=0.0,
                      learn_sigma=True, num_head_channels=64,
                      resblock_updown=True, use_scale_shift_norm=True,
                      diffusion_steps=1000, noise_schedule="linear"))
    t_unet, diff_ref = create_model_and_diffusion(**flags)
    t_unet.eval()
    f_model = adm.ffhq_unet(dtype=jnp.float32)
    params = ckpt.convert_adm_state_dict(t_unet.state_dict())
    tables = diffusion.make_diffusion(1000, "linear")

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
        inner_model=t_unet, diffusion=diff_ref, operator=ref_op,
        measurement=ref_meas, guidance="I", x0_cov_type="convert",
        recon_mse=None, device="cpu").eval()

    sigmas = schedules.get_sigmas_karras(1, 0.01, 80.0)
    x_init = (rng.randn(1, 3, SIZE, SIZE) * 80.0).astype(np.float32)
    ref_out = ref_sample_euler(ref_cond, torch.tensor(x_init),
                               torch.tensor(np.asarray(sigmas)), disable=True)

    mask = ref_op.mask.numpy()[0].transpose(1, 2, 0)
    my_op = kops.InpaintingOperator(sigma_s=jnp.float32(0.05),
                                    mask=jnp.asarray(mask))
    meas = kops.Measurement(
        y=jnp.asarray(ref_meas[0].numpy().transpose(0, 2, 3, 1)))
    cfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="convert",
                                  cg_maxiter=1000)

    def model_apply(p, x, t):
        return f_model.apply({"params": p}, x, t.astype(jnp.float32))

    uncond, var_fn = guidance.make_openai_uncond(model_apply, tables, cfg)
    denoise = guidance.make_condition_denoiser(uncond, var_fn, my_op, meas,
                                               cfg, params=params)
    our_out = samplers.sample_euler(
        lambda x, s, k: denoise(x, s, k),
        jnp.asarray(x_init.transpose(0, 2, 3, 1)), sigmas, jax.random.key(0))

    np.testing.assert_allclose(np.asarray(our_out).transpose(0, 3, 1, 2),
                               ref_out.detach().numpy(), atol=5e-4)


@pytest.mark.slow
def test_256px_v2_dct_guidance_one_call(reference_path):
    """DWT/DCT-Var (V2 learned covariance) path at production scale: one
    conditioned denoiser call at 256 px with the full FFHQ architecture +
    a random out_cov head, vs ConditionOpenAIDenoiserV2 (dct ortho basis —
    the reference's pywt DWT is stubbed in this env; the DWT layout itself
    is pinned by tests/test_dwt_pywt_layout.py)."""
    import torch
    from condition.condition import ConditionOpenAIDenoiserV2
    from condition.measurements import get_operator as ref_get_operator
    from guided_diffusion.script_util import (create_model_and_diffusion,
                                              model_and_diffusion_defaults)
    from k_diffusion.external import OpenAIDenoiserV2

    torch.manual_seed(0)
    flags = model_and_diffusion_defaults()
    flags.update(dict(image_size=SIZE, num_channels=128, num_res_blocks=1,
                      attention_resolutions="16", dropout=0.0,
                      learn_sigma=True, num_head_channels=64,
                      resblock_updown=True, use_scale_shift_norm=True,
                      diffusion_steps=1000, noise_schedule="linear"))
    t_unet, diff_ref = create_model_and_diffusion(**flags)
    t_unet.eval()
    ref_v2 = OpenAIDenoiserV2(t_unet, diff_ref, device="cpu",
                              ortho_tf_type="dct")
    torch.manual_seed(1)
    torch.nn.init.normal_(ref_v2.out_cov.weight, std=0.05)
    torch.nn.init.normal_(ref_v2.out_cov.bias, std=0.05)
    ref_v2 = ref_v2.eval()

    f_v2 = adm.ADMUNetV2(unet=adm.ffhq_unet(dtype=jnp.float32))
    params = {
        "unet": ckpt.convert_adm_state_dict(t_unet.state_dict()),
        "out_cov": ckpt.convert_v2_out_cov(
            {"out_cov.weight": ref_v2.out_cov.weight.detach(),
             "out_cov.bias": ref_v2.out_cov.bias.detach()}),
    }
    tables = diffusion.make_diffusion(1000, "linear")

    np.random.seed(0)
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
        guidance="I", device="cpu", ortho_tf_type="dct").eval()

    mask = ref_op.mask.numpy()[0].transpose(1, 2, 0)
    my_op = kops.InpaintingOperator(sigma_s=jnp.float32(0.05),
                                    mask=jnp.asarray(mask))
    meas = kops.Measurement(
        y=jnp.asarray(ref_meas[0].numpy().transpose(0, 2, 3, 1)))
    cfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="convert",
                                  ortho_tf_type="dct", cg_maxiter=200)

    def model_apply_v2(p, x_scaled, t):
        return f_v2.apply({"params": p}, x_scaled,
                          jnp.broadcast_to(t, (x_scaled.shape[0],)))

    uncond, var_fn = guidance.make_openai_v2_uncond(model_apply_v2, tables,
                                                    cfg)
    denoise = guidance.make_condition_denoiser(uncond, var_fn, my_op, meas,
                                               cfg, params=params, v2=True)

    # sigma below mle_sigma_thres => the learned-covariance CG branch
    sigma = 0.1
    x = (rng.randn(1, 3, SIZE, SIZE).astype(np.float32) * sigma
         + x0).astype(np.float32)
    ref_out = ref_cond(torch.tensor(x), torch.tensor([sigma]))
    our_out = denoise(jnp.asarray(x.transpose(0, 2, 3, 1)),
                      jnp.float32(sigma), jax.random.key(0))
    np.testing.assert_allclose(np.asarray(our_out).transpose(0, 3, 1, 2),
                               ref_out.detach().numpy(), atol=8e-3, rtol=2e-2)


@pytest.mark.slow
def test_256px_classifier_encoder_parity(reference_path):
    """EncoderUNetModel at production scale (256px, ImageNet classifier
    config: width 128, depth 2, attention pool) vs the torch reference."""
    import torch
    from guided_diffusion.script_util import classifier_defaults
    from guided_diffusion.unet import EncoderUNetModel

    from kdip_tpu import script_util as su

    flags = classifier_defaults()
    flags["image_size"] = SIZE
    torch.manual_seed(0)
    t_clf = EncoderUNetModel(
        image_size=SIZE, in_channels=3, model_channels=flags["classifier_width"],
        out_channels=1000, num_res_blocks=flags["classifier_depth"],
        attention_resolutions={SIZE // int(r) for r in
                               flags["classifier_attention_resolutions"].split(",")},
        channel_mult=(1, 1, 2, 2, 4, 4), num_head_channels=64,
        use_scale_shift_norm=True, resblock_updown=True,
        pool="attention").eval()

    f_clf, _ = su.create_classifier_and_diffusion(
        image_size=SIZE, classifier_use_fp16=False,
        classifier_width=flags["classifier_width"],
        classifier_depth=flags["classifier_depth"],
        classifier_attention_resolutions=flags["classifier_attention_resolutions"],
        classifier_use_scale_shift_norm=True, classifier_resblock_updown=True,
        classifier_pool="attention", learn_sigma=False, diffusion_steps=1000,
        noise_schedule="linear", timestep_respacing="", use_kl=False,
        predict_xstart=False, rescale_timesteps=False,
        rescale_learned_sigmas=False)
    params = ckpt.convert_classifier_state_dict(t_clf.state_dict(),
                                                "attention")

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, SIZE, SIZE).astype(np.float32) * 0.5
    ts = np.array([400.0], dtype=np.float32)
    with torch.no_grad():
        want = t_clf(torch.tensor(x), torch.tensor(ts)).numpy()
    got = np.asarray(f_clf.apply({"params": params},
                                 jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 jnp.asarray(ts)))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_256px_stsl_one_call(reference_path, monkeypatch):
    """STSL guidance at production scale: one conditioned denoiser call at
    256px with pinned Hutchinson probes on both stacks (the 16px
    call-for-call harness lives in tests/test_stsl_parity.py)."""
    import torch
    from condition import condition as ref_condition
    from condition.condition import ConditionOpenAIDenoiser
    from condition.measurements import get_operator as ref_get_operator
    from guided_diffusion.script_util import (create_model_and_diffusion,
                                              model_and_diffusion_defaults)

    torch.manual_seed(0)
    flags = model_and_diffusion_defaults()
    flags.update(dict(image_size=SIZE, num_channels=128, num_res_blocks=1,
                      attention_resolutions="16", dropout=0.0,
                      learn_sigma=True, num_head_channels=64,
                      resblock_updown=True, use_scale_shift_norm=True,
                      diffusion_steps=1000, noise_schedule="linear"))
    t_unet, diff_ref = create_model_and_diffusion(**flags)
    t_unet.eval()
    f_model = adm.ffhq_unet(dtype=jnp.float32)
    params = ckpt.convert_adm_state_dict(t_unet.state_dict())
    tables = diffusion.make_diffusion(1000, "linear")

    np.random.seed(0)
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

    n_hutch = 1
    probes = [rng.randn(1, 3, SIZE, SIZE).astype(np.float32)
              for _ in range(n_hutch)]

    ref_cond = ConditionOpenAIDenoiser(
        inner_model=t_unet, diffusion=diff_ref, operator=ref_op,
        measurement=ref_meas, guidance="stsl", x0_cov_type="convert",
        recon_mse=None, device="cpu", zeta=0.3, eta=0.7,
        num_hutchinson_samples=n_hutch).eval()
    ref_queue = [torch.tensor(p.copy()) for p in probes]
    monkeypatch.setattr(ref_condition.torch, "randn_like",
                        lambda t: ref_queue.pop(0), raising=True)

    cfg = guidance.GuidanceConfig(guidance="stsl", x0_cov_type="convert",
                                  zeta=0.3, eta=0.7,
                                  num_hutchinson_samples=n_hutch,
                                  cg_maxiter=200)

    def model_apply(p, x, t):
        return f_model.apply({"params": p}, x, t.astype(jnp.float32))

    uncond, var_fn = guidance.make_openai_uncond(model_apply, tables, cfg)
    denoise = guidance.make_condition_denoiser(uncond, var_fn, my_op, meas,
                                               cfg, params=params)
    our_queue = [p.copy() for p in probes]
    real_normal = jax.random.normal

    def fake_normal(key, shape=(), dtype=float):
        if our_queue:
            return jnp.asarray(our_queue.pop(0).transpose(0, 2, 3, 1),
                               dtype=dtype)
        return real_normal(key, shape, dtype)

    monkeypatch.setattr(jax.random, "normal", fake_normal, raising=True)

    sigma = 0.5
    x = (x0 + rng.randn(1, 3, SIZE, SIZE).astype(np.float32) * sigma)
    want = ref_cond(torch.tensor(x), torch.tensor([sigma])).detach().numpy()
    got = np.asarray(denoise(jnp.asarray(x.transpose(0, 2, 3, 1)),
                             jnp.float32(sigma),
                             jax.random.key(0))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-2)
