"""Checkpoint conversion and persistence.

- `convert_adm_state_dict`: maps a PyTorch guided-diffusion `UNetModel` state
  dict (the published `diffusion_ffhq_10m.pt` / `256x256_diffusion_uncond.pt`
  files, ref: guided_diffusion/dist_util.py:54-74 for how the reference loads
  them) into the Flax parameter tree of `kdip_tpu.models.adm.ADMUNet`,
  including the NCHW->NHWC / OIHW->HWIO layout changes.
- orbax save/load helpers for native checkpoints (replacing the reference's
  torch.save / Lightning .ckpt trio, ref: SURVEY.md §5 checkpoint/resume).

No torch dependency at import time — tensors are accepted as anything with
`.numpy()` or already-numpy arrays.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping

import numpy as np


def _to_np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    if hasattr(t, "detach"):
        t = t.detach()
    if hasattr(t, "cpu"):
        t = t.cpu()
    if hasattr(t, "numpy"):
        return t.numpy()
    return np.asarray(t)


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_RESBLOCK_MAP = {
    ("in_layers", "0"): ("in_norm", "GroupNorm_0"),
    ("in_layers", "2"): ("in_conv",),
    ("emb_layers", "1"): ("emb_proj",),
    ("out_layers", "0"): ("out_norm", "GroupNorm_0"),
    ("out_layers", "3"): ("out_conv",),
    ("skip_connection",): ("skip",),
    ("norm",): ("norm", "GroupNorm_0"),
    ("qkv",): ("qkv",),
    ("proj_out",): ("proj_out",),
    ("op",): ("op",),
    ("conv",): ("conv",),
}


def _convert_tensor(leaf_module: str, pname: str, w: np.ndarray):
    """Returns (flax_param_name, converted_array)."""
    if pname == "bias":
        return "bias", w
    assert pname == "weight", pname
    if w.ndim == 4:  # Conv2d OIHW -> HWIO
        return "kernel", w.transpose(2, 3, 1, 0)
    if w.ndim == 3:  # Conv1d (1x1) O I 1 -> Dense I O
        assert w.shape[-1] == 1
        return "kernel", w[..., 0].T
    if w.ndim == 2:  # Linear O I -> I O
        return "kernel", w.T
    if w.ndim == 1:  # norm scale
        return "scale", w
    raise ValueError(f"unhandled weight shape {w.shape} at {leaf_module}")


def convert_adm_state_dict(state_dict: Mapping[str, Any]) -> Dict:
    """PyTorch guided-diffusion UNetModel state_dict -> ADMUNet flax params.

    Key naming follows the reference module tree (guided_diffusion/unet.py):
    `input_blocks.{i}.{j}.<leaf>`, `middle_block.{j}.<leaf>`,
    `output_blocks.{i}.{j}.<leaf>`, `time_embed.{0,2}`, `out.{0,2}`,
    `label_emb`.
    """
    params: Dict = {}
    for key, tensor in state_dict.items():
        w = _to_np(tensor).astype(np.float32)
        parts = key.split(".")
        pname = parts[-1]
        body = parts[:-1]

        if body[0] == "time_embed":
            mod = {"0": "time_embed_1", "2": "time_embed_2"}[body[1]]
            name, val = _convert_tensor(mod, pname, w)
            _set(params, (mod, name), val)
            continue
        if body[0] == "label_emb":
            _set(params, ("label_emb", "embedding"), w)
            continue
        if body[0] == "out":
            if body[1] == "0":
                name, val = _convert_tensor("out_norm", pname, w)
                _set(params, ("out_norm", "GroupNorm_0", name), val)
            else:
                name, val = _convert_tensor("out_conv", pname, w)
                _set(params, ("out_conv", name), val)
            continue
        if body[0] in ("input_blocks", "output_blocks", "middle_block"):
            if body[0] == "middle_block":
                mod = f"middle_block_{body[1]}"
                rest = tuple(body[2:])
            else:
                mod = f"{body[0]}_{body[1]}_{body[2]}"
                rest = tuple(body[3:])
            if rest == ():  # input_blocks.0.0 conv (stem)
                name, val = _convert_tensor(mod, pname, w)
                _set(params, (mod, name), val)
                continue
            for src, dst in _RESBLOCK_MAP.items():
                if rest == src:
                    name, val = _convert_tensor(mod, pname, w)
                    _set(params, (mod,) + dst + (name,), val)
                    break
            else:
                raise KeyError(f"unmapped reference key: {key}")
            continue
        if body[0] == "out_cov":
            # V2 variance head (ref: k_diffusion/external.py:141): handled by
            # convert_v2_state_dict; skip here.
            continue
        raise KeyError(f"unmapped reference key: {key}")
    return params


def convert_classifier_state_dict(state_dict: Mapping[str, Any],
                                  pool: str = "attention") -> Dict:
    """PyTorch guided-diffusion `EncoderUNetModel` state dict (the published
    classifier checkpoints, ref: guided_diffusion/unet.py:688-899) ->
    `kdip_tpu.models.adm.EncoderADMUNet` flax params."""
    params: Dict = {}
    # `out` Sequential indices per pool (ref: unet.py:828-860)
    out_map = {
        "adaptive": {"0": ("out_norm", "GroupNorm_0"), "3": ("out_proj",)},
        "attention": {"0": ("out_norm", "GroupNorm_0"), "2": ("out_pool",)},
        "spatial": {"0": ("out_fc1",), "2": ("out_fc2",)},
        "spatial_v2": {"0": ("out_fc1",), "1": ("out_norm", "GroupNorm_0"),
                       "3": ("out_fc2",)},
    }[pool]
    for key, tensor in state_dict.items():
        w = _to_np(tensor).astype(np.float32)
        parts = key.split(".")
        pname = parts[-1]
        body = parts[:-1]
        if body[0] == "time_embed":
            mod = {"0": "time_embed_1", "2": "time_embed_2"}[body[1]]
            name, val = _convert_tensor(mod, pname, w)
            _set(params, (mod, name), val)
            continue
        if body[0] == "out":
            dst = out_map[body[1]]
            if dst[-1] == "out_pool":
                # AttentionPool2d (ref: unet.py:22-63)
                if pname == "positional_embedding":
                    # ref stores [C, T+1]; ours is [T+1, C]
                    _set(params, ("out_pool", "positional_embedding"), w.T)
                else:
                    sub = body[2]  # qkv_proj / c_proj (1x1 conv1d -> Dense)
                    name, val = _convert_tensor(sub, pname, w)
                    _set(params, ("out_pool", sub, name), val)
            else:
                name, val = _convert_tensor(dst[-1], pname, w)
                _set(params, dst + (name,), val)
            continue
        if body[0] in ("input_blocks", "middle_block"):
            if body[0] == "middle_block":
                mod = f"middle_block_{body[1]}"
                rest = tuple(body[2:])
            else:
                mod = f"input_blocks_{body[1]}_{body[2]}"
                rest = tuple(body[3:])
            if rest == ():
                name, val = _convert_tensor(mod, pname, w)
                _set(params, (mod, name), val)
                continue
            for src, dst in _RESBLOCK_MAP.items():
                if rest == src:
                    name, val = _convert_tensor(mod, pname, w)
                    _set(params, (mod,) + dst + (name,), val)
                    break
            else:
                raise KeyError(f"unmapped classifier key: {key}")
            continue
        raise KeyError(f"unmapped classifier key: {key}")
    return params


def convert_kdiff_state_dict(state_dict: Mapping[str, Any],
                             num_levels: int) -> Dict:
    """k-diffusion native ImageDenoiserModelV1/V2 state dict -> flax params
    for kdip_tpu.models.kdiff (ref: k_diffusion/models/image_v2.py:88-158
    module tree: u_net.d_blocks.{i}.{j}... with ConditionedSequential indices;
    u_blocks are stored reversed, unet.py `reversed(u_blocks)`).

    num_levels: len(depths) of the model (to un-reverse u_block indices).
    """
    params: Dict = {}

    def leaf(mod_path, rest, pname, w):
        if rest[0] == "main":
            sub = {"0": ("norm_1", "mapper"), "2": ("conv_1",),
                   "4": ("norm_2", "mapper"), "6": ("conv_2",)}[rest[1]]
            tail = rest[2:]  # ('mapper',) already folded for AdaGN
            if sub[-1] == "mapper":
                name, val = _convert_tensor("mapper", pname, w)
                _set(params, mod_path + sub + (name,), val)
            else:
                name, val = _convert_tensor("conv", pname, w)
                _set(params, mod_path + sub + (name,), val)
        elif rest[0] == "skip":
            name, val = _convert_tensor("skip", pname, w)
            _set(params, mod_path + ("skip", name), val)
        elif rest[0] == "norm_in":
            name, val = _convert_tensor("mapper", pname, w)
            _set(params, mod_path + ("norm_in", "mapper", name), val)
        elif rest[0] in ("qkv_proj", "out_proj"):
            # 1x1 conv stays a conv in flax (kernel HWIO)
            name, val = _convert_tensor(rest[0], pname, w)
            _set(params, mod_path + (rest[0], name), val)
        else:
            raise KeyError(f"unmapped kdiff leaf {rest}")

    # classify each (block, j) as res/attn by its children, assign ordinals
    block_children: Dict = {}
    for key in state_dict:
        parts = key.split(".")
        if parts[0] == "u_net":
            blk = (parts[1], int(parts[2]))
            j = int(parts[3])
            kind = "res" if parts[4] in ("main", "skip") else (
                "attn" if parts[4] in ("norm_in", "qkv_proj", "out_proj")
                else "resample")
            block_children.setdefault(blk, {})[j] = kind
    ordinal: Dict = {}
    for blk, js in block_children.items():
        counters = {"res": 0, "attn": 0}
        for j in sorted(js):
            kind = js[j]
            if kind == "resample":
                continue
            ordinal[blk + (j,)] = f"{kind}_{counters[kind]}"
            counters[kind] += 1

    for key, tensor in state_dict.items():
        w = _to_np(tensor).astype(np.float32)
        parts = key.split(".")
        pname = parts[-1]
        if parts[0] == "timestep_embed":
            _set(params, ("timestep_embed", "weight"), w)
        elif parts[0] == "mapping":
            mod = {"0": "mapping_0", "2": "mapping_1"}[parts[1]]
            name, val = _convert_tensor(mod, pname, w)
            _set(params, (mod, name), val)
        elif parts[0] == "mapping_cond":
            name, val = _convert_tensor("mapping_cond", pname, w)
            _set(params, ("mapping_cond", name), val)
        elif parts[0] in ("proj_in", "proj_out"):
            name, val = _convert_tensor(parts[0], pname, w)
            _set(params, (parts[0], name), val)
        elif parts[0] == "u_net":
            if pname == "kernel":  # FIR resample buffers (fixed, not params)
                continue
            side, idx, j = parts[1], int(parts[2]), int(parts[3])
            if side == "d_blocks":
                mod = f"d_block_{idx}"
            else:  # u_blocks stored reversed
                mod = f"u_block_{num_levels - 1 - idx}"
            layer = ordinal[(side, idx, j)]
            leaf((mod, layer), tuple(parts[4:-1]), pname, w)
        else:
            raise KeyError(f"unmapped kdiff key: {key}")
    return params


def convert_v2_out_cov(state_dict: Mapping[str, Any]) -> Dict:
    """Extracts the 1x1 `out_cov` variance-head conv of OpenAIDenoiserV2
    (ref: k_diffusion/external.py:141) into flax conv params."""
    w = _to_np(state_dict["out_cov.weight"]).astype(np.float32)
    b = _to_np(state_dict["out_cov.bias"]).astype(np.float32)
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": b}


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Loads a .pt/.ckpt file via torch (CPU) and returns a flat state dict.

    Handles both raw state dicts and Lightning checkpoints (which nest the
    state dict under 'state_dict' with 'model.' / 'model_ema.' prefixes,
    ref: train_openai.py:56-88)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        return obj["state_dict"]
    return obj


def strip_prefix(state_dict: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# Native (orbax) checkpointing
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, tree: Any):
    """Saves a pytree (params / train state) with orbax."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, target: Any = None) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)
