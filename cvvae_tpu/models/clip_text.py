"""CLIP text encoder (transformers ``CLIPTextModel``) in JAX.

Completes the in-framework latent-compatibility demo: the reference
pipeline encodes prompts with a torch ``CLIPTextModel``
(pipelines/pipeline_stable_diffusion.py:302-427) before denoising with
the UNet and decoding through the 3D VAE.  With this module +
``utils/convert.py::convert_clip_text_state_dict`` the whole prompted
text-to-image flow (tokenize -> text encoder -> UNet -> VideoVAE
decode) runs as JAX programs — torch is needed only offline, to read
the checkpoint.  Tokenization stays on transformers' ``CLIPTokenizer``
(pure Python, no torch).

Architecture (the SD 2.1 text tower: OpenCLIP ViT-H text encoder in
transformers' CLIPTextModel layout): token + learned position
embeddings, pre-LayerNorm transformer blocks with causal-masked
multi-head self-attention and a GELU MLP, final LayerNorm.  SD 1.x
towers (``hidden_act="quick_gelu"``) are supported via the config.

Functional params-tree style matching the converted state-dict names;
golden-tested against the real ``transformers.CLIPTextModel``
(tests/test_clip_text.py), with the full-size SD 2.1 key manifest
pinned in tests/data/clip_sd21_keys.json.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024            # SD 2.1 (ViT-H text); SD 1.x: 768
    intermediate_size: int = 4096
    num_hidden_layers: int = 23        # SD 2.1 ships 23; SD 1.x: 12
    num_attention_heads: int = 16
    max_position_embeddings: int = 77
    hidden_act: str = "gelu"           # SD 1.x: "quick_gelu"
    layer_norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def _layer_norm(x, p, eps: float):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    xf = (xf - mu) * lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return xf.astype(x.dtype)


def _dense(x, p):
    y = jnp.einsum("...i,io->...o", x, p["kernel"].astype(x.dtype))
    return y + p["bias"].astype(x.dtype)


def _act(x, kind: str):
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    if kind in ("gelu", "gelu_new", "gelu_pytorch_tanh"):
        # transformers maps "gelu" to the exact (erf) form
        return jax.nn.gelu(x, approximate=(kind != "gelu"))
    raise ValueError(f"unsupported hidden_act {kind!r}")


def _self_attention(p, x, mask, cfg: CLIPTextConfig):
    """Causal multi-head attention, fp32 softmax.

    transformers scales q by head_dim**-0.5 before the score matmul;
    scores + additive mask in fp32 match its numerics.
    """
    b, s, h = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    q = _dense(x, p["q"]).reshape(b, s, nh, hd) * (hd ** -0.5)
    k = _dense(x, p["k"]).reshape(b, s, nh, hd)
    v = _dense(x, p["v"]).reshape(b, s, nh, hd)
    scores = jnp.einsum("bqnd,bknd->bnqk", q, k).astype(jnp.float32)
    scores = scores + mask
    attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bnqk,bknd->bqnd", attn, v).reshape(b, s, h)
    return _dense(out, p["out"])


def _causal_mask(seq_len: int) -> jax.Array:
    """(1, 1, S, S) additive mask: 0 on/below the diagonal, -inf above
    (CLIP text towers are causal LMs)."""
    i = jnp.arange(seq_len)
    keep = i[:, None] >= i[None, :]
    big_neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
    return jnp.where(keep, 0.0, big_neg)[None, None]


def apply_clip_text(params: dict, input_ids: jax.Array,
                    cfg: CLIPTextConfig, *,
                    attention_mask: Optional[jax.Array] = None,
                    dtype=jnp.float32) -> jax.Array:
    """input_ids (B, S) int32 -> last_hidden_state (B, S, H).

    ``attention_mask`` (B, S) of 1/0 adds key-side padding masking on
    top of the causal mask (the SD pipelines pass none — CLIP attends
    over the full padded window, matching the reference).
    """
    b, s = input_ids.shape
    tok = params["token_embedding"].astype(dtype)[input_ids]
    pos = params["position_embedding"].astype(dtype)[:s]
    h = tok + pos[None]
    mask = _causal_mask(s)
    if attention_mask is not None:
        big_neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
        pad = jnp.where(attention_mask.astype(bool), 0.0, big_neg)
        mask = mask + pad[:, None, None, :].astype(jnp.float32)
    for layer in params["layers"]:
        res = h
        h = _layer_norm(h, layer["ln1"], cfg.layer_norm_eps)
        h = res + _self_attention(layer["attn"], h, mask, cfg)
        res = h
        h = _layer_norm(h, layer["ln2"], cfg.layer_norm_eps)
        h = _dense(_act(_dense(h, layer["fc1"]), cfg.hidden_act),
                   layer["fc2"])
        h = res + h
    return _layer_norm(h, params["final_ln"], cfg.layer_norm_eps)


def pooled_output(last_hidden: jax.Array, input_ids: jax.Array,
                  eos_token_id: int = 49407) -> jax.Array:
    """transformers' pooled_output: the hidden state at the first EOS
    token.

    Divergence note: the fallback to argmax-of-ids (transformers'
    pre-vocab-fix "legacy" behaviour) is applied *per row* here when a
    row lacks ``eos_token_id``, whereas transformers selects legacy vs
    EOS pooling *globally* from the model config.  Unreachable with the
    standard ``CLIPTokenizer`` (it always appends EOS); callers feeding
    custom ids without EOS will diverge from a non-legacy reference.
    """
    is_eos = input_ids == eos_token_id
    has_eos = is_eos.any(axis=-1)
    first_eos = jnp.argmax(is_eos, axis=-1)
    fallback = jnp.argmax(input_ids, axis=-1)
    idx = jnp.where(has_eos, first_eos, fallback)
    return jnp.take_along_axis(last_hidden, idx[:, None, None],
                               axis=1)[:, 0]


def make_text_embedder(params: dict, cfg: CLIPTextConfig,
                       dtype=jnp.bfloat16):
    """jitted (B, S) ids -> (B, S, H) embeddings closure for the
    diffusion pipeline."""
    @jax.jit
    def embed(input_ids):
        return apply_clip_text(params, input_ids, cfg, dtype=dtype)

    return embed
