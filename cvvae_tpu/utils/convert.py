"""Torch checkpoint -> JAX pytree conversion.

Converts the reference CV-VAE checkpoints (HF `from_pretrained`
directories with config.json + *.safetensors, or raw torch state dicts)
into this framework's parameter trees.  Param tree keys intentionally
mirror the reference module names (SURVEY §2), so conversion is a
mechanical path translation plus per-tensor layout transposes:

* Conv3d  (O, I, kT, kH, kW) -> (kT, kH, kW, I, O)
* Conv2d  (O, I, kH, kW)     -> (1, kH, kW, I, O)  (per-frame 3D conv)
* 1x1 attention convs / Linears -> dense kernels (I, O)
* Norm weight/bias -> scale/bias

Supported checkpoints: `vae3d`, `vae3d_v1-1` (CVVAEModel,
models/modeling_vae.py:20) and `vae3d_sd3` (CVVAESD3Model, :344).
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

# Modules whose weight/bias become scale/bias (GroupNorm / LayerNorm).
_NORM_NAMES = {"norm", "norm1", "norm2", "norm3", "norm_t", "norm_out",
               "conv_norm_out", "group_norm"}
# Modules that become dense kernels (I, O) regardless of torch rank
# (1x1 Conv2d in v1 attention, nn.Linear in temporal attention / SD3).
_DENSE_NAMES = {"q", "k", "v", "proj_out", "q_t", "k_t", "v_t",
                "proj_out_t", "to_q", "to_k", "to_v", "to_out"}

_PATH_REWRITES = [
    (re.compile(r"\bdownsample\.conv\."), "downsample."),
    (re.compile(r"\bupsample\.conv\."), "upsample."),
    (re.compile(r"\b(downsamplers\.\d+)\.conv\."), r"\1."),
    (re.compile(r"\b(upsamplers\.\d+)\.conv\."), r"\1."),
    (re.compile(r"\bto_out\.0\."), "to_out."),
    # diffusers GEGLU feed-forward (UNet transformer blocks)
    (re.compile(r"\bff\.net\.0\.proj\."), "ff_proj."),
    (re.compile(r"\bff\.net\.2\."), "ff_out."),
]


def _translate_key(key: str) -> Tuple[List, str, str]:
    """torch key -> (tree path, module_name, leaf name)."""
    for pat, rep in _PATH_REWRITES:
        key = pat.sub(rep, key)
    parts = key.split(".")
    leaf = parts[-1]
    path = [int(p) if p.isdigit() else p for p in parts[:-1]]
    module_name = next((p for p in reversed(path) if isinstance(p, str)), "")
    return path, module_name, leaf


def _convert_tensor(value: np.ndarray, module_name: str, leaf: str
                    ) -> Tuple[str, np.ndarray]:
    if module_name in _NORM_NAMES:
        return ("scale" if leaf == "weight" else "bias"), value
    if leaf == "bias":
        return "bias", value
    if leaf != "weight":
        return leaf, value
    if module_name in _DENSE_NAMES:
        if value.ndim == 4:          # 1x1 Conv2d (O, I, 1, 1)
            value = value[:, :, 0, 0]
        return "kernel", np.ascontiguousarray(value.T)  # (O, I) -> (I, O)
    if value.ndim == 5:              # Conv3d
        return "kernel", np.ascontiguousarray(value.transpose(2, 3, 4, 1, 0))
    if value.ndim == 4:              # Conv2d -> (1, kH, kW, I, O)
        return "kernel", np.ascontiguousarray(
            value.transpose(2, 3, 1, 0)[None])
    if value.ndim == 2:              # Linear
        return "kernel", np.ascontiguousarray(value.T)
    return "kernel", value


def _set_path(tree: dict, path: List, leaf: str, value: np.ndarray) -> None:
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = value


def _listify(node):
    """Convert {0: ..., 1: ...} int-keyed dicts into lists, recursively."""
    if not isinstance(node, dict):
        return node
    if node and all(isinstance(k, int) for k in node):
        return [_listify(node[i]) for i in range(len(node))]
    return {k: _listify(v) for k, v in node.items()}


def convert_state_dict(state_dict: Dict[str, np.ndarray],
                       prefixes: Tuple[str, ...] = ("encoder", "decoder"),
                       dtype=jnp.float32) -> Tuple[dict, List[str]]:
    """Convert a torch state dict to a params tree.

    Returns (params, skipped_keys).  Keys outside ``prefixes`` are skipped
    and reported (mirrors the reference's strict=False load,
    lvdm/models/autoencoder.py:68-86).
    """
    tree: dict = {}
    skipped: List[str] = []
    for key, value in state_dict.items():
        top = key.split(".", 1)[0]
        if top not in prefixes:
            skipped.append(key)
            continue
        if hasattr(value, "detach"):
            value = value.detach().cpu().numpy()
        value = np.asarray(value)
        path, module_name, leaf = _translate_key(key)
        name, converted = _convert_tensor(value, module_name, leaf)
        _set_path(tree, path, name, jnp.asarray(converted, dtype=dtype))
    return _listify(tree), skipped


# ---------------------------------------------------------------------------
# HF checkpoint directories
# ---------------------------------------------------------------------------

def _config_from_json(cfg_json: dict):
    """Build a VideoVAEConfig from a diffusers config.json."""
    from cvvae_tpu.models.vae_sd3 import VAESD3Config
    from cvvae_tpu.models.vae_v1 import VAE1Config
    from cvvae_tpu.models.video_vae import VideoVAEConfig

    cls_name = cfg_json.get("_class_name", "CVVAEModel")
    common = dict(
        en_de_n_frames_a_time=cfg_json.get("en_de_n_frames_a_time", 16),
        time_n_compress=cfg_json.get("time_n_compress", 4),
        spatial_n_compress=cfg_json.get("spatial_n_compress", 8),
        tile_spatial_size=cfg_json.get("tile_spatial_size", 576),
        tile_overlap_ratio=cfg_json.get("tile_overlap_ratio", 0.2222),
        num_video_frames=cfg_json.get("num_video_frames"),
    )
    if cls_name == "CVVAESD3Model":
        net = VAESD3Config(
            in_channels=cfg_json.get("in_channels", 3),
            latent_channels=cfg_json.get("out_channels", 16),
            block_out_channels=tuple(cfg_json.get(
                "block_out_channels", (128, 256, 512, 512))),
            layers_per_block=cfg_json.get("layers_per_block", 2),
            norm_num_groups=cfg_json.get("norm_num_groups", 32),
            double_z=cfg_json.get("double_z", True),
            mid_block_add_attention=cfg_json.get("mid_block_add_attention", True),
            causal_encoder=cfg_json.get("causal_encoder", True),
            causal_decoder=cfg_json.get("causal_decoder", False),
            half_3d=cfg_json.get("half_3d", True),
        )
        return VideoVAEConfig(
            family="sd3", net=net,
            scaling_factor=cfg_json.get("scaling_factor", 1.5305), **common)
    net = VAE1Config(
        z_channels=cfg_json.get("z_channels", 4),
        in_channels=cfg_json.get("in_channels", 3),
        out_ch=cfg_json.get("out_ch", 3),
        ch=cfg_json.get("ch", 128),
        ch_mult=tuple(cfg_json.get("ch_mult", (1, 2, 4, 4))),
        num_res_blocks=cfg_json.get("num_res_blocks", 2),
        attn_resolutions=tuple(cfg_json.get("attn_resolutions", ())),
        resolution=cfg_json.get("resolution", 256),
        use_3d_conv=cfg_json.get("use_3d_conv", True),
        dropout=cfg_json.get("dropout", 0.0),
        double_z=cfg_json.get("double_z", True),
        half_3d=cfg_json.get("half_3d", True),
        causal_encoder=cfg_json.get("causal_encoder", True),
        causal_decoder=cfg_json.get("causal_decoder", False),
    )
    return VideoVAEConfig(
        family="v1", net=net,
        scaling_factor=cfg_json.get("scaling_factor", 0.18215), **common)


def load_reference_checkpoint(cls, path: str, dtype=jnp.float32):
    """Load an HF-style checkpoint dir into a VideoVAE."""
    from safetensors import safe_open

    with open(os.path.join(path, "config.json")) as f:
        cfg_json = json.load(f)
    config = _config_from_json(cfg_json)

    state = {}
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files in {path}")
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="numpy") as f:
            for key in f.keys():
                state[key] = f.get_tensor(key)
    params, skipped = convert_state_dict(state, dtype=dtype)
    if skipped:
        print(f"[cvvae_tpu] skipped {len(skipped)} non-VAE keys "
              f"(e.g. {skipped[:3]})")
    return cls(config, params)


def load_torch_checkpoint_file(path: str, dtype=jnp.float32,
                               prefixes=("encoder", "decoder")):
    """Load a Lightning .ckpt / raw .pt / .safetensors state dict and
    convert the VAE subtrees (reference: lvdm/models/autoencoder.py:68-86)."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open
        state = {}
        with safe_open(path, framework="numpy") as f:
            for key in f.keys():
                state[key] = f.get_tensor(key)
    else:
        import torch
        blob = torch.load(path, map_location="cpu", weights_only=False)
        state = blob.get("state_dict", blob)
    return convert_state_dict(state, prefixes=prefixes, dtype=dtype)


# ---------------------------------------------------------------------------
# UNet2DConditionModel (the latent-compat denoiser)
# ---------------------------------------------------------------------------

def convert_unet_state_dict(state_dict: Dict[str, np.ndarray],
                            dtype=jnp.float32) -> dict:
    """Convert a diffusers UNet2DConditionModel state dict (SD 2.x,
    use_linear_projection) into a cvvae_tpu.models.unet2d params tree.

    The UNet has no top-level prefix, so every key converts; the same
    layout rules as the VAE apply (Conv2d -> (1,kH,kW,I,O), Linear ->
    dense (I,O), norms -> scale/bias, GEGLU ff split into
    ff_proj/ff_out)."""
    tree: dict = {}
    for key, value in state_dict.items():
        if hasattr(value, "detach"):
            value = value.detach().cpu().numpy()
        value = np.asarray(value)
        path, module_name, leaf = _translate_key(key)
        name, converted = _convert_tensor(value, module_name, leaf)
        _set_path(tree, path, name, jnp.asarray(converted, dtype=dtype))
    return _listify(tree)


def load_unet_checkpoint(path: str, dtype=jnp.float32):
    """Load a diffusers UNet checkpoint dir (config.json + safetensors)
    -> (params, UNet2DConfig)."""
    from safetensors import safe_open

    from cvvae_tpu.models.unet2d import UNet2DConfig

    with open(os.path.join(path, "config.json")) as f:
        cfg_json = json.load(f)
    head = cfg_json.get("attention_head_dim", 64)
    if isinstance(head, (list, tuple)):
        # per-block head *counts* in old configs; fall back to dim 64
        head = cfg_json["block_out_channels"][0] // head[0]
    cfg = UNet2DConfig(
        in_channels=cfg_json.get("in_channels", 4),
        out_channels=cfg_json.get("out_channels", 4),
        block_out_channels=tuple(cfg_json["block_out_channels"]),
        layers_per_block=cfg_json.get("layers_per_block", 2),
        cross_attention_dim=cfg_json.get("cross_attention_dim", 1024),
        attention_head_dim=head,
        norm_num_groups=cfg_json.get("norm_num_groups", 32))
    state = {}
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="numpy") as f:
            for key in f.keys():
                state[key] = f.get_tensor(key)
    return convert_unet_state_dict(state, dtype=dtype), cfg


# ---------------------------------------------------------------------------
# CLIPTextModel (the latent-compat prompt encoder)
# ---------------------------------------------------------------------------

_CLIP_LAYER_RE = re.compile(r"^text_model\.encoder\.layers\.(\d+)\.(.+)$")

_CLIP_ATTN = {"self_attn.q_proj": "q", "self_attn.k_proj": "k",
              "self_attn.v_proj": "v", "self_attn.out_proj": "out"}


def convert_clip_text_state_dict(state_dict: Dict[str, np.ndarray],
                                 dtype=jnp.float32) -> dict:
    """Convert a transformers ``CLIPTextModel`` state dict into a
    cvvae_tpu.models.clip_text params tree.

    Names are the real transformers names (pinned full-size in
    tests/data/clip_sd21_keys.json); Linear weights transpose to (I, O)
    dense kernels, LayerNorms become scale/bias, embeddings keep their
    (V, H)/(P, H) tables.  ``position_ids`` buffers and the projection
    head of ``CLIPTextModelWithProjection`` are skipped.
    """
    tree: dict = {"layers": {}}
    for key, value in state_dict.items():
        if hasattr(value, "detach"):
            value = value.detach().cpu().numpy()
        value = np.asarray(value)
        if key.endswith("position_ids") or key == "text_projection.weight":
            continue
        if key == "text_model.embeddings.token_embedding.weight":
            tree["token_embedding"] = jnp.asarray(value, dtype)
            continue
        if key == "text_model.embeddings.position_embedding.weight":
            tree["position_embedding"] = jnp.asarray(value, dtype)
            continue
        if key.startswith("text_model.final_layer_norm."):
            leaf = "scale" if key.endswith("weight") else "bias"
            tree.setdefault("final_ln", {})[leaf] = jnp.asarray(value, dtype)
            continue
        m = _CLIP_LAYER_RE.match(key)
        if m is None:
            raise KeyError(f"unrecognised CLIP text key: {key}")
        idx, rest = int(m.group(1)), m.group(2)
        mod, leaf = rest.rsplit(".", 1)
        layer = tree["layers"].setdefault(idx, {})
        if mod in _CLIP_ATTN:
            dest = layer.setdefault("attn", {}).setdefault(_CLIP_ATTN[mod], {})
        elif mod in ("layer_norm1", "layer_norm2"):
            dest = layer.setdefault("ln" + mod[-1], {})
            leaf = "scale" if leaf == "weight" else "bias"
        elif mod in ("mlp.fc1", "mlp.fc2"):
            dest = layer.setdefault(mod.split(".")[1], {})
        else:
            raise KeyError(f"unrecognised CLIP text key: {key}")
        if leaf == "weight":
            dest["kernel"] = jnp.asarray(
                np.ascontiguousarray(value.T), dtype)
        else:
            dest[leaf] = jnp.asarray(value, dtype)
    return _listify(tree)


def load_clip_text_checkpoint(path: str, dtype=jnp.float32):
    """Load a transformers CLIPTextModel checkpoint dir (config.json +
    safetensors / pytorch_model.bin) -> (params, CLIPTextConfig)."""
    from cvvae_tpu.models.clip_text import CLIPTextConfig

    with open(os.path.join(path, "config.json")) as f:
        cfg_json = json.load(f)
    cfg = CLIPTextConfig(
        vocab_size=cfg_json.get("vocab_size", 49408),
        hidden_size=cfg_json.get("hidden_size", 1024),
        intermediate_size=cfg_json.get("intermediate_size", 4096),
        num_hidden_layers=cfg_json.get("num_hidden_layers", 23),
        num_attention_heads=cfg_json.get("num_attention_heads", 16),
        max_position_embeddings=cfg_json.get("max_position_embeddings", 77),
        hidden_act=cfg_json.get("hidden_act", "gelu"),
        layer_norm_eps=cfg_json.get("layer_norm_eps", 1e-5))
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    state: Dict[str, np.ndarray] = {}
    if files:
        from safetensors import safe_open
        for fname in files:
            with safe_open(os.path.join(path, fname),
                           framework="numpy") as f:
                for key in f.keys():
                    state[key] = f.get_tensor(key)
    else:
        import torch
        blob = torch.load(os.path.join(path, "pytorch_model.bin"),
                          map_location="cpu", weights_only=True)
        state = {k: v.numpy() for k, v in blob.items()}
    return convert_clip_text_state_dict(state, dtype=dtype), cfg
