"""CLIP feature-extractor path (VERDICT r1 weak #9): transformers is present
in this environment, so exercise make_clip_extractor end-to-end against a
tiny locally-saved FlaxCLIPVisionModel (no network egress needed)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_clip_dir(tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    from transformers import CLIPVisionConfig, FlaxCLIPVisionModel

    cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=32, patch_size=8)
    model = FlaxCLIPVisionModel(cfg, seed=0)
    path = tmp_path_factory.mktemp("tiny_clip")
    model.save_pretrained(str(path))
    return str(path)


def test_clip_extractor_runs_and_normalizes(tiny_clip_dir):
    from kdip_tpu import evaluation

    extract = evaluation.make_clip_extractor(tiny_clip_dir)
    x = jax.random.uniform(jax.random.key(0), (3, 16, 16, 3)) * 2 - 1
    feats = np.asarray(extract(x))
    assert feats.shape == (3, 32)
    assert np.isfinite(feats).all()
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, rtol=1e-5)


def test_clip_features_feed_fid_kid(tiny_clip_dir):
    from kdip_tpu import evaluation

    extract = evaluation.make_clip_extractor(tiny_clip_dir)

    def sample_fn(key, bs):
        return jax.random.uniform(key, (bs, 16, 16, 3)) * 2 - 1

    feats_a = evaluation.compute_features(sample_fn, extract, 8, 4,
                                          jax.random.key(1))
    feats_b = evaluation.compute_features(sample_fn, extract, 8, 4,
                                          jax.random.key(2))
    fid = float(evaluation.fid(feats_a, feats_b))
    kid = float(evaluation.kid(feats_a, feats_b))
    assert np.isfinite(fid) and fid >= 0
    assert np.isfinite(kid)
