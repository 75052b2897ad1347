"""Winograd F(2,3) conv: algebraic parity with the direct lax conv.

The reference has no counterpart (all convs are torch.nn.Conv2d /cuDNN);
the oracle here is jax's own conv_general_dilated, which the rest of the
suite has already validated against the torch reference at 256px
(tests/test_parity_256_smoke.py).

The whole path lives in ops/experimental/ (measured-negative end-to-end on
v5e; no default config enables it), so the suite is marked slow — deselect
with `-m "not slow"` for the fast loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from kdip_tpu.models import layers
from kdip_tpu.ops.experimental import winograd


def _direct(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                        dimension_numbers=dn)


def test_winograd_matches_direct_f32():
    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 16, 12, 24), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (3, 3, 24, 16),
                          jnp.float32) * 0.2
    ref = _direct(x, w)
    out = winograd.winograd_conv3x3_jnp(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=5e-5)


def test_winograd_split_input_matches_concat():
    key = jax.random.key(2)
    a = jax.random.normal(key, (1, 8, 8, 20), jnp.float32)
    b = jax.random.normal(jax.random.key(3), (1, 8, 8, 12), jnp.float32)
    w = jax.random.normal(jax.random.key(4), (3, 3, 32, 8),
                          jnp.float32) * 0.2
    ref = winograd.winograd_conv3x3_jnp(jnp.concatenate([a, b], -1), w)
    out = winograd.winograd_conv3x3_jnp((a, b), w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_winograd_bf16_drift_bounded():
    """bf16 Winograd must stay within a small factor of the direct conv's
    own bf16 rounding (the F(4,3) variant fails this by ~30x and was
    rejected; scripts/winograd_proto.py)."""
    key = jax.random.key(5)
    x = jax.random.normal(key, (1, 32, 32, 64), jnp.float32)
    w = jax.random.normal(jax.random.key(6), (3, 3, 64, 64),
                          jnp.float32) * 0.1
    ref = _direct(x, w)
    scale = float(jnp.max(jnp.abs(ref)))

    xb = x.astype(jnp.bfloat16)
    err_direct = float(jnp.max(jnp.abs(
        _direct(xb, w.astype(jnp.bfloat16)).astype(jnp.float32) - ref)))
    err_wino = float(jnp.max(jnp.abs(
        winograd.winograd_conv3x3_jnp(xb, w).astype(jnp.float32) - ref)))
    assert err_wino / scale < 5e-2
    assert err_wino < 6 * max(err_direct, 1e-6 * scale)


def test_winograd_vjp_matches_direct_f32():
    key = jax.random.key(7)
    x = jax.random.normal(key, (1, 8, 8, 16), jnp.float32)
    w = jax.random.normal(jax.random.key(8), (3, 3, 16, 16),
                          jnp.float32) * 0.2
    ct = jax.random.normal(jax.random.key(9), (1, 8, 8, 16), jnp.float32)

    gx_ref = jax.vjp(lambda q: _direct(q, w), x)[1](ct)[0]
    gx = jax.vjp(lambda q: winograd.winograd_conv3x3_jnp(q, w), x)[1](ct)[0]
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=0, atol=5e-5)

    gw_ref = jax.vjp(lambda q: _direct(x, q), w)[1](ct)[0]
    gw = jax.vjp(lambda q: winograd.winograd_conv3x3_jnp(x, q), w)[1](ct)[0]
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=0, atol=2e-4)



def _randomize(params, key):
    """Replace every param (incl. zero-init out_convs, which would
    otherwise annihilate the winograd-differing contributions and make
    model-level comparisons vacuous) with small random values."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    new = [0.05 * jax.random.normal(k, l.shape, l.dtype)
           for k, l in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, new)

def test_splitskipconv_winograd_param_tree_and_value():
    """winograd=True must not change the param tree (checkpoints
    interchange) and must reproduce the direct path numerically."""
    x = jax.random.normal(jax.random.key(10), (1, 8, 8, 12), jnp.float32)
    m_dir = layers.SplitSkipConv(10, 3, dtype=jnp.float32)
    m_win = layers.SplitSkipConv(10, 3, dtype=jnp.float32, winograd=True)
    p = m_dir.init(jax.random.key(11), x)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        m_win.init(jax.random.key(11), x))
    y_dir = m_dir.apply(p, x)
    y_win = m_win.apply(p, x)
    np.testing.assert_allclose(np.asarray(y_win), np.asarray(y_dir),
                               rtol=0, atol=5e-5)


def test_winograd_odd_size_falls_back():
    """Odd H/W is ineligible; SplitSkipConv must silently take the direct
    path rather than crash."""
    x = jax.random.normal(jax.random.key(12), (1, 7, 7, 8), jnp.float32)
    m = layers.SplitSkipConv(8, 3, dtype=jnp.float32, winograd=True)
    p = m.init(jax.random.key(13), x)
    y = m.apply(p, x)
    assert y.shape == (1, 7, 7, 8)


@pytest.mark.parametrize("dtype", [jnp.bfloat16])
def test_adm_winograd_model_close_to_direct(dtype):
    """Full tiny ADM UNet: winograd torso vs direct torso, same params —
    outputs must agree within (a few x) the bf16 torso's own noise floor."""
    from kdip_tpu.models import adm

    model_kw = dict(in_channels=3, model_channels=32, out_channels=6,
                    num_res_blocks=1, attention_resolutions=(2,),
                    channel_mult=(1, 2), num_heads=2)
    m_dir = adm.ADMUNet(dtype=dtype, winograd=False, **model_kw)
    m_win = adm.ADMUNet(dtype=dtype, winograd=True, **model_kw)
    x = jax.random.uniform(jax.random.key(14), (1, 16, 16, 3)) * 2 - 1
    t = jnp.full((1,), 27.0)
    p = m_dir.init(jax.random.key(15), x, t)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        m_win.init(jax.random.key(15), x, t))
    p = _randomize(p, jax.random.key(16))

    y_dir = m_dir.apply(p, x, t).astype(jnp.float32)
    y_win = m_win.apply(p, x, t).astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(y_dir)))
    assert scale > 1e-3, "vacuous comparison: output is ~zero"
    rel = float(jnp.max(jnp.abs(y_win - y_dir))) / scale
    assert rel < 5e-2, rel


# ---- Pallas-fused variant (interpret mode on CPU; native on TPU) ----

def test_winograd_pallas_matches_jnp_f32():
    from kdip_tpu.ops.experimental import winograd_pallas as wp
    key = jax.random.key(20)
    x = jax.random.normal(key, (1, 16, 12, 24), jnp.float32)
    w = jax.random.normal(jax.random.key(21), (3, 3, 24, 16),
                          jnp.float32) * 0.2
    ref = winograd.winograd_conv3x3_jnp(x, w)
    out = wp.winograd_conv3x3_pallas(x, w, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=5e-5)


def test_winograd_pallas_split_and_chunked():
    """C > 128 and F > 128 exercise the chunking path; split input
    exercises the transform-space sum."""
    from kdip_tpu.ops.experimental import winograd_pallas as wp
    key = jax.random.key(22)
    a = jax.random.normal(key, (1, 8, 8, 130), jnp.float32)
    b = jax.random.normal(jax.random.key(23), (1, 8, 8, 30), jnp.float32)
    w = jax.random.normal(jax.random.key(24), (3, 3, 160, 140),
                          jnp.float32) * 0.1
    ref = _direct(jnp.concatenate([a, b], -1), w)
    out = wp.winograd_conv3x3_pallas((a, b), w, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=5e-4)


def test_winograd_pallas_vjp():
    from kdip_tpu.ops.experimental import winograd_pallas as wp
    key = jax.random.key(25)
    x = jax.random.normal(key, (1, 8, 8, 16), jnp.float32)
    w = jax.random.normal(jax.random.key(26), (3, 3, 16, 16),
                          jnp.float32) * 0.2
    ct = jax.random.normal(jax.random.key(27), (1, 8, 8, 16), jnp.float32)

    gx_ref, gw_ref = jax.vjp(lambda q, r: _direct(q, r), x, w)[1](ct)
    gx, gw = jax.vjp(
        lambda q, r: wp.winograd_conv3x3_pallas(q, r, interpret=True),
        x, w)[1](ct)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=0, atol=2e-4)


def test_cli_winograd_flag_reaches_model():
    from kdip_tpu import config as kconfig
    model, _ = kconfig.make_openai_model(
        {"openai": {"image_size": 64, "num_channels": 32, "num_head_channels": 32,
                    "attention_resolutions": "16"}},
        dtype=jnp.bfloat16, winograd=True)
    assert model.winograd is True
    # f32 torsos must gate winograd off regardless of the flag
    m32, _ = kconfig.make_openai_model(
        {"openai": {"image_size": 64, "num_channels": 32, "num_head_channels": 32,
                    "attention_resolutions": "16"}},
        dtype=jnp.float32, winograd=True)
    x = jax.random.uniform(jax.random.key(30), (1, 64, 64, 3))
    t = jnp.full((1,), 3.0)
    p = m32.init(jax.random.key(31), x, t)
    base, _ = kconfig.make_openai_model(
        {"openai": {"image_size": 64, "num_channels": 32, "num_head_channels": 32,
                    "attention_resolutions": "16"}}, dtype=jnp.float32)
    y_flag = m32.apply(p, x, t)
    y_base = base.apply(p, x, t)
    np.testing.assert_array_equal(np.asarray(y_flag), np.asarray(y_base))


def _ref_fused(x, w, a, b):
    """silu((x*a + b) rounded to x.dtype) -> direct conv — the composition
    the fused prologue must replay."""
    t = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    s = jax.nn.silu(t.astype(x.dtype))
    return _direct(s, w.astype(x.dtype))


def test_winograd_pallas_fused_prologue_fwd():
    from kdip_tpu.ops.experimental import winograd_pallas as wp
    key = jax.random.key(40)
    x = jax.random.normal(key, (2, 12, 8, 16), jnp.float32)
    w = jax.random.normal(jax.random.key(41), (3, 3, 16, 24),
                          jnp.float32) * 0.2
    a = jax.random.normal(jax.random.key(42), (2, 16)) * 0.5 + 1.0
    b = jax.random.normal(jax.random.key(43), (2, 16)) * 0.3
    ref = _ref_fused(x, w, a, b)
    out = wp.winograd_conv3x3_pallas(x, w, prologue=(a, b), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=5e-5)


def test_winograd_pallas_fused_prologue_vjp():
    from kdip_tpu.ops.experimental import winograd_pallas as wp
    key = jax.random.key(44)
    x = jax.random.normal(key, (1, 8, 8, 16), jnp.float32)
    w = jax.random.normal(jax.random.key(45), (3, 3, 16, 16),
                          jnp.float32) * 0.2
    a = jax.random.normal(jax.random.key(46), (1, 16)) * 0.5 + 1.0
    b = jax.random.normal(jax.random.key(47), (1, 16)) * 0.3

    def loss_ref(x, w, a, b):
        return jnp.sum(jnp.sin(_ref_fused(x, w, a, b)))

    def loss_fused(x, w, a, b):
        return jnp.sum(jnp.sin(wp.winograd_conv3x3_pallas(
            x, w, prologue=(a, b), interpret=True)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, a, b)
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, a, b)
    for gr, gf, name in zip(g_ref, g_f, "xwab"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=0, atol=3e-4, err_msg=name)


def test_winograd_pallas_fused_split_parts():
    from kdip_tpu.ops.experimental import winograd_pallas as wp
    key = jax.random.key(48)
    h = jax.random.normal(key, (1, 8, 8, 20), jnp.float32)
    s = jax.random.normal(jax.random.key(49), (1, 8, 8, 12), jnp.float32)
    w = jax.random.normal(jax.random.key(50), (3, 3, 32, 8),
                          jnp.float32) * 0.2
    a = jax.random.normal(jax.random.key(51), (1, 32)) * 0.5 + 1.0
    b = jax.random.normal(jax.random.key(52), (1, 32)) * 0.3
    ref = _ref_fused(jnp.concatenate([h, s], -1), w, a, b)
    out = wp.winograd_conv3x3_pallas((h, s), w, prologue=(a, b),
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=5e-5)


def test_groupnorm_return_affine_matches_apply():
    x = jax.random.normal(jax.random.key(53), (2, 8, 8, 32), jnp.bfloat16)
    gn = layers.GroupNorm32(num_groups=8)
    p = gn.init(jax.random.key(54), x)
    y = gn.apply(p, x)
    a, b = gn.apply(p, x, return_affine=True)
    y2 = (x.astype(jnp.float32) * a[:, None, None, :]
          + b[:, None, None, :]).astype(x.dtype)
    np.testing.assert_allclose(np.asarray(y2, np.float32),
                               np.asarray(y, np.float32), rtol=0, atol=1e-6)


def test_adm_winograd_scale_shift_norm_branch():
    """FFHQ uses use_scale_shift_norm=True — the fused path absorbs the
    FiLM scale/shift into the GroupNorm affine; outputs must track the
    direct torso within the bf16 noise floor."""
    from kdip_tpu.models import adm

    model_kw = dict(in_channels=3, model_channels=32, out_channels=6,
                    num_res_blocks=1, attention_resolutions=(2,),
                    channel_mult=(1, 2), num_heads=2,
                    use_scale_shift_norm=True)
    m_dir = adm.ADMUNet(dtype=jnp.bfloat16, winograd=False, **model_kw)
    m_win = adm.ADMUNet(dtype=jnp.bfloat16, winograd=True, **model_kw)
    x = jax.random.uniform(jax.random.key(60), (1, 16, 16, 3)) * 2 - 1
    t = jnp.full((1,), 41.0)
    p = m_dir.init(jax.random.key(61), x, t)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        m_win.init(jax.random.key(61), x, t))
    p = _randomize(p, jax.random.key(62))
    y_dir = m_dir.apply(p, x, t).astype(jnp.float32)
    y_win = m_win.apply(p, x, t).astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(y_dir)))
    assert scale > 1e-3, "vacuous comparison: output is ~zero"
    rel = float(jnp.max(jnp.abs(y_win - y_dir))) / scale
    assert rel < 5e-2, rel

    # and the winograd model must still differentiate (guided-sampling vjp)
    def f(q):
        return jnp.sum(m_win.apply(p, q, t).astype(jnp.float32))
    g = jax.grad(f)(x)
    assert bool(jnp.isfinite(g).all())


def test_guided_sampling_through_winograd_torso():
    """Full guided posterior sampling with winograd=True: the pallas
    custom VJP must compose with jax.vjp inside the guidance lax.scan/
    cond machinery, and the result must stay close to the direct torso."""
    import kdip_tpu as K
    from kdip_tpu.models import adm

    def run(wino):
        model = adm.ADMUNet(in_channels=3, model_channels=32, out_channels=6,
                            num_res_blocks=1, attention_resolutions=(2,),
                            channel_mult=(1, 2), num_heads=2,
                            dtype=jnp.bfloat16, winograd=wino)
        params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                            jnp.zeros((1,)))["params"]
        tables = K.diffusion.make_diffusion(100, "linear")

        def model_apply(p, xx, t):
            return model.apply({"params": p}, xx, t.astype(jnp.float32))

        op = K.operators.get_operator(
            "inpainting", sigma_s=0.02,
            mask_opt=dict(mask_type="random", mask_prob_range=(0.5, 0.5),
                          image_size=16), seed=0)
        sampler = K.sampling_api.build_posterior_sampler(
            model_apply, tables, op,
            K.guidance.GuidanceConfig(guidance="I", x0_cov_type="convert",
                                      cg_maxiter=10),
            K.sampling_api.SamplerConfig(steps=5), image_size=16)
        x0 = jax.random.uniform(jax.random.key(1), (1, 16, 16, 3)) * 2 - 1
        meas = op.measure(x0, jax.random.key(2))
        return sampler(params, meas, jax.random.key(3), n=1)

    out_dir = run(False)
    out_win = run(True)
    assert bool(jnp.isfinite(out_win).all())
    # same params, same keys: trajectories agree to bf16-torso noise
    diff = float(jnp.max(jnp.abs(out_win.astype(jnp.float32)
                                 - out_dir.astype(jnp.float32))))
    assert diff < 0.2, diff


_DP_SHARDING_BODY = """
import jax, jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from kdip_tpu.models import adm

assert len(jax.devices()) >= 2
mesh = Mesh(jax.devices(), ("dp",))
model = adm.ADMUNet(in_channels=3, model_channels=32, out_channels=6,
                    num_res_blocks=1, attention_resolutions=(2,),
                    channel_mult=(1, 2), num_heads=2,
                    dtype=jnp.bfloat16, winograd=True)
n = len(jax.devices())
x = jax.random.uniform(jax.random.key(0), (n, 16, 16, 3)) * 2 - 1
t = jnp.full((n,), 11.0)
p = model.init(jax.random.key(1), x[:1], t[:1])["params"]
xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
ps = jax.device_put(p, NamedSharding(mesh, P()))
y = jax.jit(lambda pp, xx: model.apply({"params": pp}, xx, t))(ps, xs)
assert y.shape == (n, 16, 16, 6) and bool(jnp.isfinite(y).all())
print("DP_SHARDING_OK")
"""


def test_winograd_under_dp_sharding():
    """The pallas path must compose with NamedSharding/jit (the --dp eval
    layout): batch sharded over the mesh, params replicated.

    Runs in a FRESH subprocess: 8 concurrent Pallas-interpret executions
    under pjit twice crashed the long-lived suite interpreter with a
    bare SIGABRT mid-suite (~44 tests of prior XLA CPU state; round 3's
    ~92% 'Fatal Python error' and again 2026-08-19) while always passing
    in a clean process. Isolation keeps the coverage and removes the
    suite-killer; the winograd path is opt-in-off (RESULTS.md rejection),
    so a crash here must never take down the default-path suite run."""
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    import subprocess
    import sys
    r = subprocess.run([sys.executable, "-c", _DP_SHARDING_BODY],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (r.stdout[-500:], r.stderr[-1500:])
    assert "DP_SHARDING_OK" in r.stdout
