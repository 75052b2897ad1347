"""Flag-compatible factory surface (kdip_tpu/script_util.py) vs the
reference's guided_diffusion/script_util.py, plus the FIXED_SMALL /
START_X p_mean_variance branches against the torch reference as oracle."""

import argparse

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu import diffusion, script_util


def test_defaults_match_reference(reference_path):
    from guided_diffusion import script_util as ref
    assert script_util.diffusion_defaults() == ref.diffusion_defaults()
    assert script_util.classifier_defaults() == ref.classifier_defaults()
    assert (script_util.model_and_diffusion_defaults()
            == ref.model_and_diffusion_defaults())
    assert (script_util.classifier_and_diffusion_defaults()
            == ref.classifier_and_diffusion_defaults())
    assert (script_util.sr_model_and_diffusion_defaults()
            == ref.sr_model_and_diffusion_defaults())


def test_create_model_and_diffusion_matches_reference_config(reference_path):
    from guided_diffusion import script_util as ref

    kwargs = script_util.model_and_diffusion_defaults()
    kwargs.update(image_size=64, num_channels=32, num_res_blocks=1,
                  learn_sigma=True, timestep_respacing="ddim25")
    model, spec = script_util.create_model_and_diffusion(**kwargs)
    t_model, t_diff = ref.create_model_and_diffusion(**kwargs)

    assert model.model_channels == t_model.model_channels
    assert tuple(model.channel_mult) == tuple(t_model.channel_mult)
    assert set(model.attention_resolutions) == set(
        t_model.attention_resolutions)
    assert model.out_channels == t_model.out_channels
    assert spec.learn_sigma and spec.loss_type == "mse"
    np.testing.assert_allclose(np.asarray(spec.tables.betas),
                               np.asarray(t_diff.betas), atol=1e-7)
    np.testing.assert_array_equal(np.asarray(spec.tables.timestep_map),
                                  np.asarray(t_diff.timestep_map))


def test_fixed_small_and_predict_xstart_match_reference(reference_path):
    import torch
    from guided_diffusion import gaussian_diffusion as gd
    from guided_diffusion.respace import SpacedDiffusion, space_timesteps

    steps = 50
    betas = gd.get_named_beta_schedule("linear", 1000)
    tables = diffusion.make_diffusion(1000, "linear",
                                      timestep_respacing=[steps])
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 8, 8).astype(np.float32)
    out = rng.randn(2, 3, 8, 8).astype(np.float32)
    t = np.array([3, 40], dtype=np.int64)

    for var_type, mean_type, kw in [
        (gd.ModelVarType.FIXED_SMALL, gd.ModelMeanType.EPSILON,
         dict(learn_sigma=False, sigma_small=True)),
        (gd.ModelVarType.FIXED_LARGE, gd.ModelMeanType.START_X,
         dict(learn_sigma=False, predict_xstart=True)),
    ]:
        ref_diff = SpacedDiffusion(
            use_timesteps=space_timesteps(1000, [steps]), betas=betas,
            model_mean_type=mean_type, model_var_type=var_type,
            loss_type=gd.LossType.MSE)
        want = ref_diff.p_mean_variance(
            lambda xx, tt: torch.tensor(out), torch.tensor(x),
            torch.tensor(t))
        got = diffusion.p_mean_variance(
            tables, jnp.asarray(out.transpose(0, 2, 3, 1)),
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t), **kw)
        for k_ours, k_ref in [("mean", "mean"), ("variance", "variance"),
                              ("pred_xstart", "pred_xstart")]:
            ours = np.asarray(got[k_ours]).transpose(0, 3, 1, 2)
            ref_v = want[k_ref].numpy()
            # our fixed variances stay [B,1,1,1]; broadcast for comparison
            np.testing.assert_allclose(
                np.broadcast_to(ours, ref_v.shape), ref_v, atol=1e-4,
                err_msg=f"{var_type} {k_ours}")


def test_sr_factory_builds_and_runs():
    kwargs = script_util.sr_model_and_diffusion_defaults()
    kwargs.update(large_size=64, small_size=16, num_channels=32,
                  num_res_blocks=1, num_head_channels=16)
    model, spec = script_util.sr_create_model_and_diffusion(**kwargs)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                        jnp.zeros((1,)), low_res=jnp.zeros((1, 16, 16, 3)))
    y = model.apply(params, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,)),
                    low_res=jnp.zeros((1, 16, 16, 3)))
    assert y.shape == (1, 64, 64, 3)
    assert spec.tables.num_timesteps == 1000


def test_argparse_bridges(reference_path):
    from guided_diffusion import script_util as ref

    p = argparse.ArgumentParser()
    script_util.add_dict_to_argparser(
        p, dict(a=1, b=0.5, c=True, d=None, e="x"))
    args = p.parse_args(["--a", "2", "--c", "false"])
    assert args.a == 2 and args.c is False and args.b == 0.5 and args.d is None
    assert script_util.args_to_dict(args, ["a", "e"]) == {"a": 2, "e": "x"}
    for s in ("yes", "no", "T", "0"):
        assert script_util.str2bool(s) == ref.str2bool(s)
    with pytest.raises(argparse.ArgumentTypeError):
        script_util.str2bool("maybe")


def test_model_timesteps_matches_wrapped_model(reference_path):
    import torch
    from guided_diffusion.respace import _WrappedModel

    tables = diffusion.make_diffusion(1000, "linear",
                                      timestep_respacing="ddim25")
    seen = {}

    def capture(x, ts):
        seen["ts"] = ts
        return x

    wm = _WrappedModel(capture, np.asarray(tables.timestep_map).tolist(),
                       rescale_timesteps=True, original_num_steps=1000)
    t = np.array([0, 7, 24])
    wm(torch.zeros(3, 1), torch.tensor(t))
    got = np.asarray(diffusion.model_timesteps(tables, jnp.asarray(t),
                                               rescale_timesteps=True,
                                               original_num_steps=1000))
    np.testing.assert_allclose(got, seen["ts"].numpy(), atol=1e-6)

    wm = _WrappedModel(capture, np.asarray(tables.timestep_map).tolist(),
                       rescale_timesteps=False, original_num_steps=1000)
    wm(torch.zeros(3, 1), torch.tensor(t))
    got = np.asarray(diffusion.model_timesteps(tables, jnp.asarray(t)))
    np.testing.assert_allclose(got, seen["ts"].numpy().astype(np.float32),
                               atol=1e-6)


def test_training_losses_predict_xstart_matches_reference(reference_path):
    import torch
    from guided_diffusion import gaussian_diffusion as gd
    from guided_diffusion.respace import SpacedDiffusion, space_timesteps

    from kdip_tpu import ddpm_sampling

    betas = gd.get_named_beta_schedule("linear", 1000)
    tables = diffusion.make_diffusion(1000, "linear", timestep_respacing=[50])
    ref_diff = SpacedDiffusion(
        use_timesteps=space_timesteps(1000, [50]), betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE)

    rng = np.random.RandomState(0)
    x0 = rng.randn(2, 3, 8, 8).astype(np.float32)
    out = rng.randn(2, 3, 8, 8).astype(np.float32)
    noise = rng.randn(2, 3, 8, 8).astype(np.float32)
    t = np.array([5, 30])

    want = ref_diff.training_losses(
        lambda xx, tt: torch.tensor(out), torch.tensor(x0),
        torch.tensor(t), noise=torch.tensor(noise))["loss"].numpy()
    got = ddpm_sampling.training_losses(
        tables, lambda xx, tt: jnp.asarray(out.transpose(0, 2, 3, 1)),
        jnp.asarray(x0.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jax.random.key(0), learn_sigma=False, predict_xstart=True,
        noise=jnp.asarray(noise.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got["loss"]), want, atol=1e-5)


def test_training_losses_predict_xstart_learn_sigma_matches_reference(
        reference_path):
    """learn_sigma=True + predict_xstart=True: the frozen-mean VB term must
    interpret the mean head as START_X, not EPSILON
    (ref: gaussian_diffusion.py:771-796)."""
    import torch
    from guided_diffusion import gaussian_diffusion as gd
    from guided_diffusion.respace import SpacedDiffusion, space_timesteps

    from kdip_tpu import ddpm_sampling

    betas = gd.get_named_beta_schedule("linear", 1000)
    tables = diffusion.make_diffusion(1000, "linear", timestep_respacing=[50])
    ref_diff = SpacedDiffusion(
        use_timesteps=space_timesteps(1000, [50]), betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.LEARNED_RANGE,
        loss_type=gd.LossType.MSE)

    rng = np.random.RandomState(1)
    x0 = rng.randn(2, 3, 8, 8).astype(np.float32)
    out = rng.randn(2, 6, 8, 8).astype(np.float32)
    noise = rng.randn(2, 3, 8, 8).astype(np.float32)
    t = np.array([0, 30])

    want = ref_diff.training_losses(
        lambda xx, tt: torch.tensor(out), torch.tensor(x0),
        torch.tensor(t), noise=torch.tensor(noise))["loss"].numpy()
    got = ddpm_sampling.training_losses(
        tables, lambda xx, tt: jnp.asarray(out.transpose(0, 2, 3, 1)),
        jnp.asarray(x0.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jax.random.key(0), learn_sigma=True, predict_xstart=True,
        noise=jnp.asarray(noise.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got["loss"]), want, atol=1e-5)
