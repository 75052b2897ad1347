"""Config system: JSON experiment configs deep-merged onto defaults.

Equivalent of `k_diffusion/config.py:11-136` (jsonmerge-based defaults,
model factory, denoiser-wrapper factory, sample-density factory) plus the
OpenAI flag defaults (`condition/diffpir_utils/utils_model.py:353-396` and
`guided_diffusion/script_util.py:43-72`). Reads the same JSON files the
reference ships in `configs/` (e.g. test_ffhq.json).
"""

from __future__ import annotations

import copy
import json
from typing import Any, Dict, IO, Union

import jax.numpy as jnp

from . import diffusion
from .models import adm, kdiff
from .utils import make_sample_density  # noqa: F401 (re-export)


def deep_merge(base: Dict, override: Dict) -> Dict:
    """Recursive dict merge (replacement for jsonmerge.merge,
    ref: k_diffusion/config.py:47)."""
    out = copy.deepcopy(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


CONFIG_DEFAULTS: Dict[str, Any] = {
    # ref: k_diffusion/config.py:12-45
    "model": {
        "sigma_data": 1.0,
        "patch_size": 1,
        "dropout_rate": 0.0,
        "augment_wrapper": True,
        "augment_prob": 0.0,
        "mapping_cond_dim": 0,
        "unet_cond_dim": 0,
        "cross_cond_dim": 0,
        "cross_attn_depths": None,
        "skip_stages": 0,
        "has_variance": False,
        "loss_config": "karras",
    },
    "dataset": {"type": "imagefolder"},
    "optimizer": {"type": "adamw", "lr": 1e-4, "betas": [0.95, 0.999],
                  "eps": 1e-6, "weight_decay": 1e-3},
    "lr_sched": {"type": "constant"},
    "ema_sched": {"type": "inverse", "power": 0.6667, "max_value": 0.9999},
}

# OpenAI model flag defaults (ref: diffpir_utils/utils_model.py:353-381)
OPENAI_MODEL_DEFAULTS: Dict[str, Any] = {
    "diffusion_steps": 1000,
    "noise_schedule": "linear",
    "num_head_channels": 64,
    "resblock_updown": True,
    "use_fp16": False,
    "use_scale_shift_norm": True,
    "num_heads": 4,
    "num_heads_upsample": -1,
    "use_new_attention_order": False,
    "timestep_respacing": "",
    "learn_sigma": True,
    "class_cond": False,
    "image_size": 256,
    "num_channels": 128,
    "num_res_blocks": 1,
    "attention_resolutions": "16",
    "dropout": 0.1,
    "channel_mult": "",
}


def load_config(file: Union[str, IO, Dict]) -> Dict:
    """Loads + merges a model/experiment JSON config
    (ref: k_diffusion/config.py:11-47)."""
    if isinstance(file, dict):
        config = file
    elif isinstance(file, str):
        with open(file) as f:
            config = json.load(f)
    else:
        config = json.load(file)
    return deep_merge(CONFIG_DEFAULTS, config)


def make_openai_model(model_config: Dict, dtype=jnp.float32, **kw):
    """Builds (ADMUNet, DiffusionTables) from a config's "openai" block
    (ref: k_diffusion/config.py:52-65 + script_util.create_model_and_diffusion)."""
    flags = dict(OPENAI_MODEL_DEFAULTS)
    flags.update(model_config.get("openai", {}))
    model = adm.create_unet(
        image_size=flags["image_size"], num_channels=flags["num_channels"],
        num_res_blocks=flags["num_res_blocks"], channel_mult=flags["channel_mult"],
        learn_sigma=flags["learn_sigma"], class_cond=flags["class_cond"],
        attention_resolutions=str(flags["attention_resolutions"]),
        num_heads=flags["num_heads"], num_head_channels=flags["num_head_channels"],
        num_heads_upsample=flags["num_heads_upsample"],
        use_scale_shift_norm=flags["use_scale_shift_norm"],
        dropout=flags["dropout"], resblock_updown=flags["resblock_updown"],
        use_new_attention_order=flags["use_new_attention_order"], dtype=dtype,
        **kw)
    tables = diffusion.make_diffusion(flags["diffusion_steps"],
                                      flags["noise_schedule"],
                                      flags["timestep_respacing"] or None)
    return model, tables


def make_model(config: Dict, dtype=jnp.float32):
    """Model factory (ref: k_diffusion/config.py:50-90). Returns the Flax
    module (and tables for the openai family)."""
    mc = config["model"]
    ty = mc["type"]
    if ty.startswith("openai"):
        return make_openai_model(mc, dtype=dtype)
    if ty == "image_v2":
        Model = kdiff.ImageDenoiserModelV2
    elif ty == "image_v1":
        Model = kdiff.ImageDenoiserModelV1
    else:
        raise ValueError("Invalid denoiser type")
    mapping_cond_dim = mc["mapping_cond_dim"] + (9 if mc["augment_wrapper"] else 0)
    model = Model(
        c_in=mc["input_channels"], feats_in=mc["mapping_out"],
        depths=tuple(mc["depths"]), channels=tuple(mc["channels"]),
        self_attn_depths=tuple(mc["self_attn_depths"]),
        mapping_cond_dim=mapping_cond_dim, unet_cond_dim=mc["unet_cond_dim"],
        dropout_rate=mc["dropout_rate"], patch_size=mc["patch_size"],
        skip_stages=mc["skip_stages"], has_variance=mc["has_variance"])
    return model


def make_denoiser_wrapper(config: Dict):
    """Loss/denoiser wrapper factory (ref: k_diffusion/config.py:93-107).
    Returns (loss_kind, sigma_data, ortho_tf_type) for train.py to assemble
    the loss function."""
    mc = config["model"]
    sigma_data = mc.get("sigma_data", 1.0)
    has_variance = mc.get("has_variance", False)
    loss_config = mc.get("loss_config", "karras")
    ortho_tf_type = mc.get("ortho_tf_type", None)
    if loss_config == "karras":
        kind = "variance" if has_variance else "edm"
        return kind, sigma_data, ortho_tf_type
    if loss_config == "simple":
        if has_variance:
            raise ValueError("the simple loss cannot train a variance head")
        return "simple", sigma_data, ortho_tf_type
    raise ValueError("Unknown loss config type")
