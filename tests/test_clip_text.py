"""Golden CLIP text encoder tests vs the REAL transformers model.

The reference encodes prompts with transformers' CLIPTextModel
(pipelines/pipeline_stable_diffusion.py:302-427).  Unlike the UNet
(diffusers is not installed, so its golden runs against a stub), the
genuine transformers implementation IS in this image — the converter
mapping is therefore tested against real state-dict names, and the
full-size SD 2.1 key manifest is pinned in tests/data/clip_sd21_keys.json.
"""

import json
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from cvvae_tpu.models.clip_text import (CLIPTextConfig, apply_clip_text,
                                        pooled_output)
from cvvae_tpu.utils.convert import convert_clip_text_state_dict

transformers = pytest.importorskip("transformers")

_DATA = os.path.join(os.path.dirname(__file__), "data")


def _tiny_pair(hidden_act: str):
    torch.manual_seed(0)
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act=hidden_act,
        bos_token_id=97, eos_token_id=98)
    net = transformers.CLIPTextModel(hf_cfg).eval()
    cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act=hidden_act)
    params = convert_clip_text_state_dict(net.state_dict())
    return net, params, cfg


@pytest.mark.parametrize("hidden_act", ["gelu", "quick_gelu"])
def test_clip_text_forward_parity(hidden_act):
    net, params, cfg = _tiny_pair(hidden_act)
    rng = np.random.RandomState(1)
    ids = rng.randint(0, 99, size=(2, 16)).astype(np.int64)
    with torch.no_grad():
        ref = net(torch.from_numpy(ids)).last_hidden_state.numpy()
    out = apply_clip_text(params, jnp.asarray(ids, jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_clip_text_pooled_output():
    net, params, cfg = _tiny_pair("gelu")
    hf_eos = net.config.eos_token_id
    rng = np.random.RandomState(2)
    ids = rng.randint(0, 98, size=(2, 16)).astype(np.int64)
    ids[0, 5] = hf_eos
    ids[1, 11] = hf_eos
    with torch.no_grad():
        ref = net(torch.from_numpy(ids)).pooler_output.numpy()
    out = apply_clip_text(params, jnp.asarray(ids, jnp.int32), cfg)
    pooled = pooled_output(out, jnp.asarray(ids, jnp.int32),
                           eos_token_id=hf_eos)
    np.testing.assert_allclose(np.asarray(pooled), ref, atol=2e-5)


def test_clip_sd21_key_manifest():
    """The pinned full-size SD 2.1 text-encoder key manifest converts
    cleanly: every key consumed, every param landing where apply_clip_text
    reads it.  Pins the converter against the REAL checkpoint layout
    without the weights being present in this environment."""
    with open(os.path.join(_DATA, "clip_sd21_keys.json")) as f:
        manifest = json.load(f)
    cfg = CLIPTextConfig(**manifest["config"])
    state = {k: np.zeros(shape, np.float32)
             for k, shape in manifest["keys"].items()}
    params = convert_clip_text_state_dict(state)
    assert params["token_embedding"].shape == (cfg.vocab_size,
                                               cfg.hidden_size)
    assert params["position_embedding"].shape == (
        cfg.max_position_embeddings, cfg.hidden_size)
    assert len(params["layers"]) == cfg.num_hidden_layers
    for layer in params["layers"]:
        assert layer["attn"]["q"]["kernel"].shape == (cfg.hidden_size,
                                                      cfg.hidden_size)
        assert layer["fc1"]["kernel"].shape == (cfg.hidden_size,
                                                cfg.intermediate_size)
    # zero weights -> finite forward (shape plumbing end to end)
    ids = jnp.zeros((1, 77), jnp.int32)
    out = apply_clip_text(params, ids, cfg)
    assert out.shape == (1, 77, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_clip_text_padding_mask_matches_transformers():
    net, params, cfg = _tiny_pair("gelu")
    rng = np.random.RandomState(3)
    ids = rng.randint(0, 99, size=(2, 16)).astype(np.int64)
    mask = np.ones((2, 16), np.int64)
    mask[0, 10:] = 0
    mask[1, 4:] = 0
    with torch.no_grad():
        ref = net(torch.from_numpy(ids),
                  attention_mask=torch.from_numpy(mask)
                  ).last_hidden_state.numpy()
    out = apply_clip_text(params, jnp.asarray(ids, jnp.int32), cfg,
                          attention_mask=jnp.asarray(mask, jnp.int32))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)
