"""TrainLoop: microbatching, loss-aware sampling, EMA chain, save/resume."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu import diffusion, logger, resample
from kdip_tpu.models import adm
from kdip_tpu.train_loop import TrainLoop, find_resume_checkpoint


@pytest.fixture()
def tiny_setup():
    model = adm.ADMUNet(image_size=16, model_channels=32, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_heads=2, num_head_channels=16, out_channels=6)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,)))["params"]

    def model_fn(p, x, t):
        return model.apply({"params": p}, x, t.astype(jnp.float32))

    tables = diffusion.make_diffusion(1000, "linear", "50")
    rng = np.random.RandomState(0)
    data = [rng.rand(4, 16, 16, 3).astype(np.float32) * 2 - 1 for _ in range(6)]
    return model_fn, params, tables, data


def test_train_loop_runs_and_saves(tiny_setup, tmp_path):
    model_fn, params, tables, data = tiny_setup
    with logger.scoped_configure(dir=str(tmp_path / "logs"), format_strs=["csv"]):
        loop = TrainLoop(model_fn=model_fn, params=params, tables=tables,
                         data=iter(data), batch_size=4, microbatch=2,
                         lr=1e-4, ema_rate="0.5,0.9",
                         schedule_sampler=resample.LossSecondMomentResampler(50),
                         save_interval=3, logdir=str(tmp_path / "ckpt"),
                         loss_type="rescaled_mse", resume=False)
        loop.run_loop(max_steps=4)
    assert loop.step == 4
    assert os.path.isdir(tmp_path / "ckpt" / "model_3")
    assert os.path.isdir(tmp_path / "ckpt" / "model_4")
    assert os.path.isdir(tmp_path / "ckpt" / "ema_0.5_3")
    assert os.path.isdir(tmp_path / "ckpt" / "ema_0.9_3")
    assert os.path.isdir(tmp_path / "ckpt" / "opt_3")
    # loss-aware sampler received updates
    assert loop.schedule_sampler._loss_counts.sum() > 0


def test_train_loop_gns(tiny_setup, tmp_path):
    """measure_gns wires the gradient-noise-scale estimator into the
    microbatch loop (VERDICT r1 weak #7: gns.py was dead code)."""
    model_fn, params, tables, data = tiny_setup
    with logger.scoped_configure(dir=str(tmp_path / "logs"), format_strs=[]):
        loop = TrainLoop(model_fn=model_fn, params=params, tables=tables,
                         data=iter(data), batch_size=4, microbatch=2,
                         lr=1e-4, save_interval=100,
                         logdir=str(tmp_path / "ckpt"), resume=False,
                         measure_gns=True)
        loop.run_loop(max_steps=3)
    assert loop.gns is not None
    assert np.isfinite(loop.gns.get_gns())
    sq_norm, var = loop.gns.get_stats()
    assert np.isfinite(sq_norm) and np.isfinite(var)
    with pytest.raises(ValueError):
        TrainLoop(model_fn=model_fn, params=params, tables=tables,
                  data=iter(data), batch_size=4, microbatch=4, lr=1e-4,
                  logdir=str(tmp_path / "x"), resume=False, measure_gns=True)


def test_train_loop_resume(tiny_setup, tmp_path):
    model_fn, params, tables, data = tiny_setup
    logdir = str(tmp_path / "ckpt")
    with logger.scoped_configure(dir=str(tmp_path / "l1"), format_strs=[]):
        loop1 = TrainLoop(model_fn=model_fn, params=params, tables=tables,
                          data=iter(data), batch_size=4, lr=1e-4,
                          save_interval=2, logdir=logdir, resume=False)
        loop1.run_loop(max_steps=2)
    assert find_resume_checkpoint(logdir).endswith("model_2")
    with logger.scoped_configure(dir=str(tmp_path / "l2"), format_strs=[]):
        loop2 = TrainLoop(model_fn=model_fn, params=params, tables=tables,
                          data=iter(data), batch_size=4, lr=1e-4,
                          save_interval=2, logdir=logdir, resume=True)
    assert loop2.step == 2
    # resumed params equal saved ones
    a = jax.tree.leaves(loop1.params)
    b = jax.tree.leaves(loop2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_training_test_env_short_circuit(tiny_setup, tmp_path, monkeypatch):
    """DIFFUSION_TRAINING_TEST stops after the first save
    (ref: train_util.py:164-166)."""
    model_fn, params, tables, data = tiny_setup
    monkeypatch.setenv("DIFFUSION_TRAINING_TEST", "1")
    with logger.scoped_configure(dir=str(tmp_path / "l"), format_strs=[]):
        loop = TrainLoop(model_fn=model_fn, params=params, tables=tables,
                         data=iter(data), batch_size=4, lr=1e-4,
                         save_interval=1, logdir=str(tmp_path / "c"),
                         resume=False)
        loop.run_loop(max_steps=10)
    assert loop.step == 1


def test_per_sample_map_grads_match_batched():
    """make_train_step(per_sample_map=True) — the batch-1 conv layout for
    training — must produce the same update as the batched gradient."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from kdip_tpu import train

    def loss_fn(p, x0, noise, sigma):
        pred = x0 * p["w"] + noise * jnp.exp(p["b"])
        return jnp.mean((pred - x0) ** 2 * sigma[:, None, None, None],
                        axis=(1, 2, 3))

    params = {"w": jnp.ones(()) * 0.7, "b": jnp.zeros(())}
    opt = optax.sgd(0.1)
    density = lambda k, s: jnp.exp(jax.random.normal(k, s) * 0.3)
    outs = {}
    for psm in (False, True):
        step = jax.jit(train.make_train_step(loss_fn, opt, density,
                                             per_sample_map=psm))
        st = train.create_train_state(params, opt)
        batch = jax.random.normal(jax.random.key(0), (4, 8, 8, 3))
        st, m = step(st, batch, jax.random.key(1), 0.99)
        outs[psm] = (float(m["loss"]), np.asarray(st.params["w"]),
                     np.asarray(st.params["b"]))
    assert outs[False][0] == pytest.approx(outs[True][0], abs=1e-6)
    np.testing.assert_allclose(outs[False][1], outs[True][1], atol=1e-6)
    np.testing.assert_allclose(outs[False][2], outs[True][2], atol=1e-6)
