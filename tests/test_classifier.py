"""Classifier-guidance encoder (EncoderUNetModel) parity and end-to-end
classifier-guided sampling through the condition_mean/score hooks
(VERDICT r1 missing #2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu import ckpt, ddpm_sampling, diffusion
from kdip_tpu.models import adm

SIZE = 16


def _torch_encoder(pool):
    import torch
    from guided_diffusion.unet import EncoderUNetModel

    torch.manual_seed(0)
    return EncoderUNetModel(
        image_size=SIZE, in_channels=3, model_channels=32, out_channels=10,
        num_res_blocks=1, attention_resolutions={2}, dropout=0.0,
        channel_mult=(1, 2), num_heads=4, num_head_channels=16,
        use_scale_shift_norm=True, resblock_updown=True, pool=pool).eval()


def _flax_encoder(pool):
    return adm.EncoderADMUNet(
        image_size=SIZE, in_channels=3, model_channels=32, out_channels=10,
        num_res_blocks=1, attention_resolutions=(2,), dropout=0.0,
        channel_mult=(1, 2), num_heads=4, num_head_channels=16,
        use_scale_shift_norm=True, resblock_updown=True, pool=pool)


@pytest.mark.parametrize("pool", ["attention", "adaptive", "spatial",
                                  "spatial_v2"])
def test_encoder_forward_parity(reference_path, pool):
    import torch

    t_model = _torch_encoder(pool)
    f_model = _flax_encoder(pool)
    params = ckpt.convert_classifier_state_dict(t_model.state_dict(), pool)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, SIZE, SIZE).astype(np.float32)
    ts = np.array([17.0, 500.0], dtype=np.float32)

    with torch.no_grad():
        ref = t_model(torch.tensor(x), torch.tensor(ts)).numpy()
    ours = np.asarray(f_model.apply({"params": params},
                                    jnp.asarray(x.transpose(0, 2, 3, 1)),
                                    jnp.asarray(ts)))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_create_classifier_factory():
    # width must keep attention channels divisible by num_head_channels=64
    model = adm.create_classifier(image_size=64, classifier_width=64,
                                  classifier_depth=1, out_channels=10)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                        jnp.zeros((1,)))["params"]
    out = model.apply({"params": params}, jnp.zeros((1, 64, 64, 3)),
                      jnp.zeros((1,)))
    assert out.shape == (1, 10)


def test_classifier_guided_condition_hooks_parity(reference_path):
    """condition_mean / condition_score against the reference, driven by a
    real classifier gradient (grad log p(y|x) of the converted encoder)."""
    import torch
    from guided_diffusion.script_util import create_gaussian_diffusion
    from guided_diffusion.unet import UNetModel

    torch.manual_seed(1)
    t_unet = UNetModel(image_size=SIZE, in_channels=3, model_channels=32,
                       out_channels=6, num_res_blocks=1,
                       attention_resolutions={2}, dropout=0.0,
                       channel_mult=(1, 2), num_heads=4, num_head_channels=16,
                       use_scale_shift_norm=True, resblock_updown=True).eval()
    diff_ref = create_gaussian_diffusion(steps=100, learn_sigma=True,
                                         noise_schedule="linear")
    t_clf = _torch_encoder("attention")

    f_unet = adm.ADMUNet(image_size=SIZE, in_channels=3, model_channels=32,
                         out_channels=6, num_res_blocks=1,
                         attention_resolutions=(2,), dropout=0.0,
                         channel_mult=(1, 2), num_heads=4, num_head_channels=16,
                         use_scale_shift_norm=True, resblock_updown=True)
    unet_params = ckpt.convert_adm_state_dict(t_unet.state_dict())
    f_clf = _flax_encoder("attention")
    clf_params = ckpt.convert_classifier_state_dict(t_clf.state_dict(),
                                                    "attention")
    tables = diffusion.make_diffusion(100, "linear")

    y_cls = 3
    scale = 2.0

    def ref_cond_fn(x, t, **kwargs):
        with torch.enable_grad():
            x_in = x.detach().requires_grad_(True)
            logits = t_clf(x_in, t)
            log_probs = torch.log_softmax(logits, dim=-1)
            selected = log_probs[range(len(logits)), y_cls]
            return torch.autograd.grad(selected.sum(), x_in)[0] * scale

    def our_cond_fn(x, t):
        def logp(xx):
            logits = f_clf.apply({"params": clf_params}, xx,
                                 t.astype(jnp.float32))
            return jnp.sum(jax.nn.log_softmax(logits)[:, y_cls])
        return jax.grad(logp)(x) * scale

    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, SIZE, SIZE).astype(np.float32)
    t_np = np.array([40, 40], dtype=np.int64)

    ref_pmv = diff_ref.p_mean_variance(t_unet, torch.tensor(x),
                                       torch.tensor(t_np))
    ref_mean = diff_ref.condition_mean(ref_cond_fn, ref_pmv, torch.tensor(x),
                                       torch.tensor(t_np), model_kwargs={})
    ref_score = diff_ref.condition_score(ref_cond_fn, ref_pmv, torch.tensor(x),
                                         torch.tensor(t_np), model_kwargs={})

    x_j = jnp.asarray(x.transpose(0, 2, 3, 1))
    t_j = jnp.asarray(t_np).astype(jnp.int32)
    model_out = f_unet.apply({"params": unet_params}, x_j,
                             t_j.astype(jnp.float32))
    our_pmv = diffusion.p_mean_variance(tables, model_out, x_j, t_j,
                                        clip_denoised=True)
    our_mean = ddpm_sampling.condition_mean(tables, our_cond_fn, our_pmv,
                                            x_j, t_j)
    our_score = ddpm_sampling.condition_score(tables, our_cond_fn, our_pmv,
                                              x_j, t_j)

    np.testing.assert_allclose(
        np.asarray(our_mean).transpose(0, 3, 1, 2),
        ref_mean.detach().numpy(), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(our_score["mean"]).transpose(0, 3, 1, 2),
        ref_score["mean"].detach().numpy(), atol=1e-3, rtol=1e-3)


def test_classifier_guided_p_sample_loop_runs():
    """End-to-end classifier-guided ancestral sampling (tiny models, jitted
    scan): finite output in range.

    NB: a raw 20-step linear schedule is degenerate (beta_end scales to 1.0,
    alphas_cumprod -> 0 exactly; the torch reference NaNs identically), so we
    respace a 100-step base chain down to 20 like real deployments do."""
    tables = diffusion.make_diffusion(100, "linear", timestep_respacing="20")
    unet = adm.ADMUNet(image_size=SIZE, in_channels=3, model_channels=32,
                       out_channels=6, num_res_blocks=1,
                       attention_resolutions=(2,), channel_mult=(1, 2),
                       num_heads=2, num_head_channels=16)
    uparams = unet.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)),
                        jnp.zeros((1,)))["params"]
    clf = _flax_encoder("attention")
    cparams = clf.init(jax.random.key(1), jnp.zeros((1, SIZE, SIZE, 3)),
                       jnp.zeros((1,)))["params"]

    def model_fn(x, t):
        return unet.apply({"params": uparams}, x, t.astype(jnp.float32))

    def cond_fn(x, t):
        def logp(xx):
            logits = clf.apply({"params": cparams}, xx, t.astype(jnp.float32))
            return jnp.sum(jax.nn.log_softmax(logits)[:, 0])
        return jax.grad(logp)(x)

    out = jax.jit(lambda k: ddpm_sampling.p_sample_loop(
        tables, model_fn, (1, SIZE, SIZE, 3), k, cond_fn=cond_fn))(
        jax.random.key(2))
    assert np.isfinite(np.asarray(out)).all()
