"""GuidanceConfig.remat_vjp must be a pure scheduling knob.

Rematerialization replays the exact same ops in the backward pass, so every
accepted spec — True (full), "conv_dots" (save MXU outputs only), or a named
jax.checkpoint_policies member — must leave the guided trajectory
bit-identical to remat off. The perf tradeoffs are measured on-chip
(RESULTS.md); correctness is pinned here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kdip_tpu import diffusion, guidance, sampling_api
from kdip_tpu import operators as kops
from kdip_tpu.models import adm

SIZE = 16


@pytest.fixture(scope="module")
def tiny_model():
    model = adm.ADMUNet(image_size=SIZE, model_channels=32, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_heads=2, num_head_channels=16, out_channels=6)
    params = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)),
                        jnp.zeros((1,)))["params"]

    def model_apply(p, x, t):
        return model.apply({"params": p}, x,
                           jnp.broadcast_to(t, (x.shape[0],)).astype(
                               jnp.float32))

    return model_apply, params


@pytest.fixture(scope="module")
def inpaint_setup():
    op = kops.get_operator("inpainting", sigma_s=0.05,
                           mask_opt=dict(mask_type="random",
                                         mask_prob_range=(0.5, 0.5),
                                         image_size=SIZE), seed=0)
    x0 = jax.random.uniform(jax.random.key(1), (1, SIZE, SIZE, 3)) * 2 - 1
    meas = op.measure(x0, jax.random.key(2))
    return op, meas


def _run(model_apply, params, op, meas, remat):
    tables = diffusion.make_diffusion(1000, "linear")
    gcfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="convert",
                                   remat_vjp=remat)
    scfg = sampling_api.SamplerConfig(steps=3)
    sampler = sampling_api.build_posterior_sampler(
        model_apply, tables, op, gcfg, scfg, image_size=SIZE)
    return np.asarray(jax.jit(
        lambda p, m, k: sampler(p, m, k, n=1))(params, meas,
                                               jax.random.key(3)))


@pytest.mark.parametrize("remat", [True, "conv_dots", "dots_saveable"])
def test_remat_policies_bit_identical(tiny_model, inpaint_setup, remat):
    model_apply, params = tiny_model
    op, meas = inpaint_setup
    base = _run(model_apply, params, op, meas, remat=False)
    np.testing.assert_array_equal(
        base, _run(model_apply, params, op, meas, remat=remat))
    assert np.isfinite(base).all()


def test_policy_resolution():
    assert guidance._remat_policy(True) is None
    p = guidance._remat_policy("conv_dots")
    class _Prim:
        def __init__(self, name):
            self.name = name
    assert p(_Prim("conv_general_dilated")) and p(_Prim("dot_general"))
    assert not p(_Prim("exp"))
    assert (guidance._remat_policy("dots_saveable")
            is jax.checkpoint_policies.dots_saveable)
    with pytest.raises(AttributeError):
        guidance._remat_policy("not_a_policy")
