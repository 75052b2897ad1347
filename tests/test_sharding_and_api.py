"""Mesh-sharded posterior sampling and the sampling_api on the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu import diffusion, guidance, sampling_api
from kdip_tpu import operators as kops
from kdip_tpu.models import adm
from kdip_tpu.parallel import sharding as sh


@pytest.fixture(scope="module")
def setup():
    model = adm.ADMUNet(image_size=16, model_channels=32, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_heads=2, num_head_channels=16, out_channels=6)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,)))["params"]
    tables = diffusion.make_diffusion(1000, "linear")

    def model_apply(p, x, t):
        return model.apply({"params": p}, x,
                           jnp.broadcast_to(t, (x.shape[0],)).astype(jnp.float32))

    return model_apply, params, tables


def test_posterior_sampler_api(setup):
    model_apply, params, tables, = setup
    op = kops.get_operator("inpainting", sigma_s=0.05,
                           mask_opt=dict(mask_type="random",
                                         mask_prob_range=(0.5, 0.5),
                                         image_size=16), seed=0)
    gcfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="convert",
                                   cg_maxiter=20)
    scfg = sampling_api.SamplerConfig(steps=3)
    sampler = sampling_api.build_posterior_sampler(model_apply, tables, op,
                                                   gcfg, scfg, image_size=16)
    x0 = jax.random.uniform(jax.random.key(1), (1, 16, 16, 3)) * 2 - 1
    meas = op.measure(x0, jax.random.key(2))
    out = jax.jit(lambda p, m, k: sampler(p, m, k))(params, meas,
                                                    jax.random.key(3))
    assert out.shape == (1, 16, 16, 3)
    assert bool(jnp.isfinite(out).all())
    assert float(jnp.abs(out).max()) <= 1.0 + 1e-5


def test_per_sample_map_matches_batched(setup):
    """per_sample_map=True (the fast v5e layout, see RESULTS.md) must produce
    the same samples as the batched denoise path."""
    model_apply, params, tables = setup
    op = kops.get_operator("inpainting", sigma_s=0.05,
                           mask_opt=dict(mask_type="random",
                                         mask_prob_range=(0.5, 0.5),
                                         image_size=16), seed=0)
    gcfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="convert",
                                   cg_maxiter=20)
    x0 = jax.random.uniform(jax.random.key(1), (1, 16, 16, 3)) * 2 - 1
    meas = op.measure(x0, jax.random.key(2))
    outs = {}
    for psm in (False, True):
        scfg = sampling_api.SamplerConfig(steps=3, per_sample_map=psm)
        sampler = sampling_api.build_posterior_sampler(
            model_apply, tables, op, gcfg, scfg, image_size=16)
        outs[psm] = np.asarray(jax.jit(
            lambda p, m, k: sampler(p, m, k, n=3))(params, meas,
                                                   jax.random.key(3)))
    np.testing.assert_allclose(outs[True], outs[False], atol=2e-4)


def test_sharded_batch_sampling_matches_unsharded(setup):
    """8-way dp-sharded guided sampling == single-device, bitwise-comparable
    math (same program, different layout)."""
    model_apply, params, tables = setup
    mesh = sh.make_mesh(8)
    op = kops.get_operator("inpainting", sigma_s=0.05,
                           mask_opt=dict(mask_type="random",
                                         mask_prob_range=(0.5, 0.5),
                                         image_size=16), seed=0)
    gcfg = guidance.GuidanceConfig(guidance="pgdm", x0_cov_type="pgdm")
    scfg = sampling_api.SamplerConfig(steps=3, ode=True)
    sampler = sampling_api.build_posterior_sampler(model_apply, tables, op,
                                                   gcfg, scfg, image_size=16)

    x0 = jax.random.uniform(jax.random.key(1), (8, 16, 16, 3)) * 2 - 1
    meas = op.measure(x0, jax.random.key(2))

    def sample_fn(p, m, k):
        return sampler(p, m, k, n=8)

    plain = jax.jit(sample_fn)(params, meas, jax.random.key(3))
    sharded_sampler = sh.make_sharded_sampler(sample_fn, mesh)
    shard = sharded_sampler(params, meas, jax.random.key(3))
    np.testing.assert_allclose(np.asarray(shard), np.asarray(plain), atol=1e-4)
    # output really is distributed over the mesh
    assert len(shard.sharding.device_set) == 8


def test_vmapped_measurements(setup):
    """vmap over a batch of *different* measurements (different masks) — the
    capability the reference's batch=1 design forbids."""
    model_apply, params, tables = setup
    masks = np.stack([kops.generate_mask(mask_type="random",
                                         mask_prob_range=(0.5, 0.5),
                                         image_size=16, seed=s)
                      for s in range(3)])
    gcfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="convert",
                                   cg_maxiter=20)
    uncond, var_fn = guidance.make_openai_uncond(model_apply, tables, gcfg)

    def one(mask, y, x, key):
        op = kops.InpaintingOperator(sigma_s=jnp.float32(0.05), mask=mask)
        meas = kops.Measurement(y=y[None])
        denoise = guidance.make_condition_denoiser(uncond, var_fn, op, meas,
                                                   gcfg, params=params)
        return denoise(x[None], jnp.float32(1.0), key)[0]

    x0 = jax.random.uniform(jax.random.key(1), (3, 16, 16, 3)) * 2 - 1
    ys = jnp.asarray(masks) * x0
    xs = jax.random.normal(jax.random.key(2), (3, 16, 16, 3))
    keys = jax.random.split(jax.random.key(3), 3)
    out = jax.vmap(one)(jnp.asarray(masks), ys, xs, keys)
    assert out.shape == (3, 16, 16, 3)
    assert bool(jnp.isfinite(out).all())
    # per-example independence: recomputing example 0 alone matches
    solo = one(jnp.asarray(masks[0]), ys[0], xs[0], keys[0])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(solo), atol=1e-4)
