"""InceptionV3 FID backbone: output shape, converter structural parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu.models import inception


@pytest.fixture(scope="module")
def init_vars():
    model = inception.InceptionV3Features()
    x = jnp.zeros((1, 64, 64, 3))
    return model, model.init(jax.random.key(0), x)


def test_output_shape(init_vars):
    model, variables = init_vars
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    feats = model.apply(variables, x)
    assert feats.shape == (2, 2048)
    assert bool(jnp.isfinite(feats).all())


def test_converter_structure_matches_init(init_vars):
    """A synthetic torch-style state dict with the init tree's shapes must
    convert to exactly the init structure."""
    model, variables = init_vars

    # build a fake torch state dict from the flax tree
    state_dict = {}

    def walk(tree, stats, prefix):
        for k in tree:
            p = tree[k]
            s = stats.get(k, {}) if isinstance(stats, dict) else {}
            if isinstance(p, dict):
                if k == "conv":
                    state_dict[prefix + "conv.weight"] = np.asarray(
                        p["kernel"]).transpose(3, 2, 0, 1)
                elif k == "bn":
                    state_dict[prefix + "bn.weight"] = np.asarray(p["scale"])
                    state_dict[prefix + "bn.bias"] = np.asarray(p["bias"])
                    state_dict[prefix + "bn.running_mean"] = np.asarray(s["mean"])
                    state_dict[prefix + "bn.running_var"] = np.asarray(s["var"])
                else:
                    walk(p, s, prefix + k + ".")
            else:
                raise AssertionError(f"unexpected leaf at {prefix}{k}")

    walk(variables["params"], variables["batch_stats"], "")
    converted = inception.convert_inception_state_dict(state_dict)

    ref_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
    conv_paths = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(converted["params"])[0]}
    assert ref_paths == conv_paths
    stats_ref = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(variables["batch_stats"])[0]}
    stats_conv = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(converted["batch_stats"])[0]}
    assert stats_ref == stats_conv

    # converted weights run
    out = model.apply(converted, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 2048)
