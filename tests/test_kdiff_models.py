"""k-diffusion native model family: shapes, variance outputs, augmentation
wrapper, patching, and the EDM training loss path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu import train, utils
from kdip_tpu.models import kdiff
from kdip_tpu.ops.transforms import OrthoTransform
from kdip_tpu.parallel import sharding as sh


@pytest.fixture(scope="module")
def v2_model():
    model = kdiff.ImageDenoiserModelV2(
        c_in=3, feats_in=64, depths=(2, 2), channels=(32, 64),
        self_attn_depths=(False, True), mapping_cond_dim=9, has_variance=True)
    params = model.init(jax.random.key(0), jnp.zeros((2, 32, 32, 3)),
                        jnp.float32(1.0),
                        mapping_cond=jnp.zeros((2, 9)))["params"]
    return model, params


def test_v2_shapes_and_variance(v2_model):
    model, params = v2_model
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    out = model.apply({"params": params}, x, jnp.float32(1.0),
                      mapping_cond=jnp.zeros((2, 9)))
    assert out.shape == (2, 32, 32, 3)
    out, lv, lvot = model.apply({"params": params}, x, jnp.float32(1.0),
                                mapping_cond=jnp.zeros((2, 9)),
                                return_variance=True)
    assert lv.shape == (2, 32, 32, 3) and lvot.shape == (2, 32, 32, 3)
    # zero-init head => zero outputs at init
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_v1_scalar_logvar():
    model = kdiff.ImageDenoiserModelV1(
        c_in=3, feats_in=64, depths=(1, 1), channels=(32, 64),
        self_attn_depths=(False, False), has_variance=True)
    params = model.init(jax.random.key(0), jnp.zeros((2, 16, 16, 3)),
                        jnp.float32(1.0))["params"]
    out, logvar = model.apply({"params": params},
                              jax.random.normal(jax.random.key(1), (2, 16, 16, 3)),
                              jnp.float32(1.0), return_variance=True)
    assert out.shape == (2, 16, 16, 3)
    assert logvar.shape == (2,)


def test_patch_size():
    model = kdiff.ImageDenoiserModelV2(
        c_in=3, feats_in=32, depths=(1,), channels=(32,),
        self_attn_depths=(False,), patch_size=2)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.float32(1.0))["params"]
    out = model.apply({"params": params},
                      jax.random.normal(jax.random.key(1), (1, 16, 16, 3)),
                      jnp.float32(1.0))
    assert out.shape == (1, 16, 16, 3)


def test_augment_wrapper(v2_model):
    model, params = v2_model

    def model_apply(p, x, sigma, mapping_cond=None, **kw):
        return model.apply({"params": p}, x, sigma, mapping_cond=mapping_cond,
                           **kw)

    wrapped = kdiff.karras_augment_wrapper(model_apply)
    x = jax.random.normal(jax.random.key(2), (2, 32, 32, 3))
    # default zeros aug_cond
    out0 = wrapped(params, x, jnp.float32(1.0))
    # explicit cond changes the output
    cond = jnp.ones((2, 9))
    out1 = wrapped(params, x, jnp.float32(1.0), aug_cond=cond)
    assert out0.shape == out1.shape == (2, 32, 32, 3)


def test_edm_variance_training_step(v2_model):
    """DCT-Var style training: EDM scalings + dual NLL through the native
    model (the configs/train_ffhq_dct.json path)."""
    model, params = v2_model
    ortho_tf = OrthoTransform("dct")
    density = utils.make_sample_density(
        {"sigma_sample_density": {"type": "cosine"}, "sigma_data": 0.5},
        sigma_data=0.5, sigma_min=1e-2, sigma_max=80.0)

    def model_apply(p, x_scaled, sigma, **kw):
        return model.apply({"params": p}, x_scaled, sigma,
                           mapping_cond=jnp.zeros((x_scaled.shape[0], 9)),
                           return_variance=True)

    def loss_fn(p, x0, noise, sigma):
        return train.variance_loss(model_apply, p, x0, noise, sigma, ortho_tf,
                                   sigma_data=0.5)

    import optax
    opt = optax.adam(1e-4)
    state = train.create_train_state(params, opt)
    step = jax.jit(train.make_train_step(loss_fn, opt, density))
    batch = jax.random.uniform(jax.random.key(3), (4, 32, 32, 3)) * 2 - 1
    state, m = step(state, batch, jax.random.key(4), 0.99)
    assert bool(jnp.isfinite(m["loss"]))


def test_cross_attention_masking():
    """CrossAttention2d: padded encoder positions are fully masked out
    (ref: k_diffusion/layers.py:196-197)."""
    m = kdiff.CrossAttention2d(c_dec=32, c_enc=16, n_head=2, norm_groups=4)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 32))
    cond = jax.random.normal(jax.random.key(1), (2, 64))
    cross = jax.random.normal(jax.random.key(2), (2, 5, 16))
    pad = jnp.zeros((2, 5)).at[:, 3:].set(1.0)
    p = m.init(jax.random.key(3), x, cond, cross, pad)["params"]
    out = m.apply({"params": p}, x, cond, cross, pad)
    assert out.shape == x.shape
    # changing masked positions must not change the output
    out2 = m.apply({"params": p}, x, cond, cross.at[:, 3:].set(100.0), pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=2e-4)


def test_gns_inside_shard_map():
    from jax.sharding import PartitionSpec as P
    from kdip_tpu import gns
    mesh = sh.make_mesh(8)
    grads = jax.random.normal(jax.random.key(0), (8, 64))  # per-device rows

    def fn(g):
        return gns.grad_norm_stats({"w": g}, axis="dp")

    small, big = jax.shard_map(fn, mesh=mesh, in_specs=P("dp"),
                               out_specs=(P(), P()))(grads)
    # pure noise: E[small] = n (dim), E[big] = n / n_devices
    assert float(small) > float(big) * 4
    est = gns.GradientNoiseScale(beta=0.5)
    for _ in range(10):
        est.update(float(small), float(big), 1, 8)
    assert np.isfinite(est.get_gns())
