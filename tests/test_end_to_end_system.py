"""Full-system capability test: train a small diffusion model from scratch on
a synthetic distribution, then solve an inverse problem with guided posterior
sampling and verify the guidance actually helps.

This exercises the complete production path — training_losses (eps+var),
TrainLoop-style optimization, checkpointing-free in-memory handoff, the
ConditionOpenAIDenoiser-equivalent guidance with the Convert covariance, the
Heun sampler, and PSNR metrics — with no pretrained weights needed.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from kdip_tpu import ddpm_sampling, diffusion, guidance, metrics, samplers, schedules
from kdip_tpu import operators as kops
from kdip_tpu.models import adm

SIZE = 16


def _synthetic_batch(key, n):
    """Smooth two-tone images: random linear color gradients (structured
    enough that inpainting is solvable from context)."""
    k1, k2, k3 = jax.random.split(key, 3)
    xs = jnp.linspace(-1, 1, SIZE)
    yy, xx = jnp.meshgrid(xs, xs, indexing="ij")
    theta = jax.random.uniform(k1, (n, 1, 1, 1)) * 2 * jnp.pi
    ramp = (jnp.cos(theta) * xx[None, :, :, None]
            + jnp.sin(theta) * yy[None, :, :, None])
    c0 = jax.random.uniform(k2, (n, 1, 1, 3)) * 2 - 1
    c1 = jax.random.uniform(k3, (n, 1, 1, 3)) * 2 - 1
    img = c0 + (c1 - c0) * (ramp + 1) / 2
    return jnp.clip(img, -1, 1)


@pytest.fixture(scope="module")
def trained_model():
    model = adm.ADMUNet(image_size=SIZE, model_channels=32, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_heads=2, num_head_channels=16, out_channels=6)
    params = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)),
                        jnp.zeros((1,)))["params"]
    tables = diffusion.make_diffusion(1000, "linear")

    def model_fn_factory(p):
        return lambda x, t: model.apply({"params": p}, x, t.astype(jnp.float32))

    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch, key):
        k_t, k_n = jax.random.split(key)
        t = jax.random.randint(k_t, (batch.shape[0],), 0, 1000)

        def loss_fn(p):
            terms = ddpm_sampling.training_losses(
                tables, model_fn_factory(p), batch, t, k_n,
                loss_type="rescaled_mse")
            return jnp.mean(terms["loss"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(1)
    losses = []
    for i in range(200):
        key, k_b, k_s = jax.random.split(key, 3)
        batch = _synthetic_batch(k_b, 16)
        params, opt_state, loss = step(params, opt_state, batch, k_s)
        losses.append(float(loss))
    assert np.mean(losses[-20:]) < np.mean(losses[:20]) * 0.5, \
        "training did not converge"
    return model, params, tables


def test_guided_beats_unconditional(trained_model):
    model, params, tables = trained_model

    def model_apply(p, x, t):
        return model.apply({"params": p}, x, t.astype(jnp.float32))

    # ground truth + inpainting measurement (60% of pixels dropped)
    x0 = _synthetic_batch(jax.random.key(42), 1)
    op = kops.get_operator("inpainting", sigma_s=0.05,
                           mask_opt=dict(mask_type="random",
                                         mask_prob_range=(0.6, 0.6),
                                         image_size=SIZE), seed=3)
    meas = op.measure(x0, jax.random.key(43))
    sigmas = schedules.get_sigmas_karras(20, 0.01, 80.0)

    def run(guidance_name, cov):
        cfg = guidance.GuidanceConfig(guidance=guidance_name, x0_cov_type=cov,
                                      cg_maxiter=50, zeta=1.0)
        uncond, var_fn = guidance.make_openai_uncond(model_apply, tables, cfg)
        denoise = guidance.make_condition_denoiser(uncond, var_fn, op, meas,
                                                   cfg, params=params)
        x_init = jax.random.normal(jax.random.key(7), (1, SIZE, SIZE, 3)) * 80.0
        out = samplers.sample_heun(denoise, x_init, sigmas, jax.random.key(8))
        return metrics.compute_metrics(out, x0)

    m_uncond = run("uncond", "convert")
    m_typeI = run("I", "convert")
    m_dps = run("dps", "dps")
    print("uncond:", m_uncond, "typeI:", m_typeI, "dps:", m_dps)

    # guided reconstructions must beat the unconditional sample by a wide
    # margin, and Type-I with Convert covariance should be competitive
    assert m_typeI["psnr"] > m_uncond["psnr"] + 5.0
    assert m_dps["psnr"] > m_uncond["psnr"]
    assert m_typeI["ssim"] > m_uncond["ssim"]
