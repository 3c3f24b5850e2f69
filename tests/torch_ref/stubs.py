"""Minimal xformers / diffusers stand-ins so the reference imports.

Only the functionality the reference actually exercises is provided:

* ``xformers.ops.memory_efficient_attention`` == torch SDPA (both
  compute softmax(q k^T / sqrt(d)) v; xformers default scale is
  1/sqrt(head_dim), same as SDPA).
* ``diffusers.models.attention_processor.Attention`` in the
  deprecated-attn-block configuration used by UNetMidBlock3D
  (single-head, GroupNorm pre-norm, Linear qkv with bias,
  residual_connection=True, rescale 1.0) — matching diffusers'
  AttnProcessor2_0 semantics for 4D inputs.
* tiny shims: get_activation, is_torch_version, deprecate, logging,
  BaseOutput, RMSNorm, SpatialNorm, randn_tensor.
"""

import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F


def _make_module(name):
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


class _Attention(nn.Module):
    def __init__(self, query_dim, heads=8, dim_head=64,
                 rescale_output_factor=1.0, eps=1e-5, norm_num_groups=None,
                 spatial_norm_dim=None, residual_connection=False, bias=False,
                 upcast_softmax=False, _from_deprecated_attn_block=False,
                 **kwargs):
        super().__init__()
        inner_dim = dim_head * heads
        self.heads = heads
        self.rescale_output_factor = rescale_output_factor
        self.residual_connection = residual_connection
        self.group_norm = (
            nn.GroupNorm(num_channels=query_dim, num_groups=norm_num_groups,
                         eps=eps, affine=True)
            if norm_num_groups is not None else None)
        self.to_q = nn.Linear(query_dim, inner_dim, bias=bias)
        self.to_k = nn.Linear(query_dim, inner_dim, bias=bias)
        self.to_v = nn.Linear(query_dim, inner_dim, bias=bias)
        self.to_out = nn.ModuleList(
            [nn.Linear(inner_dim, query_dim, bias=True), nn.Dropout(0.0)])

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, **kwargs):
        residual = hidden_states
        input_ndim = hidden_states.ndim
        if input_ndim == 4:
            b, c, h, w = hidden_states.shape
            hidden_states = hidden_states.view(b, c, h * w).transpose(1, 2)
        bsz = hidden_states.shape[0]
        if self.group_norm is not None:
            hidden_states = self.group_norm(
                hidden_states.transpose(1, 2)).transpose(1, 2)
        query = self.to_q(hidden_states)
        key = self.to_k(hidden_states)
        value = self.to_v(hidden_states)
        inner_dim = key.shape[-1]
        head_dim = inner_dim // self.heads
        query, key, value = (
            t.view(bsz, -1, self.heads, head_dim).transpose(1, 2)
            for t in (query, key, value))
        out = F.scaled_dot_product_attention(query, key, value)
        out = out.transpose(1, 2).reshape(bsz, -1, inner_dim)
        out = self.to_out[0](out)
        out = self.to_out[1](out)
        if input_ndim == 4:
            out = out.transpose(-1, -2).reshape(b, c, h, w)
        if self.residual_connection:
            out = out + residual
        return out / self.rescale_output_factor


def install():
    if "diffusers" in sys.modules and "xformers" in sys.modules:
        return

    # ---- xformers ----
    xf = _make_module("xformers")
    xf.__version__ = "0.0.29"
    xf_ops = _make_module("xformers.ops")

    def memory_efficient_attention(q, k, v, attn_bias=None, op=None):
        assert attn_bias is None
        return F.scaled_dot_product_attention(q, k, v)

    xf_ops.memory_efficient_attention = memory_efficient_attention
    xf.ops = xf_ops

    # ---- diffusers ----
    d = _make_module("diffusers")
    d_models = _make_module("diffusers.models")
    d_act = _make_module("diffusers.models.activations")
    d_down = _make_module("diffusers.models.downsampling")
    d_attn = _make_module("diffusers.models.attention_processor")
    d_utils = _make_module("diffusers.utils")
    d_tutils = _make_module("diffusers.utils.torch_utils")
    d.models = d_models
    d.utils = d_utils

    def get_activation(name):
        name = name.lower()
        if name in ("silu", "swish"):
            return nn.SiLU()
        if name == "gelu":
            return nn.GELU()
        if name == "relu":
            return nn.ReLU()
        raise ValueError(name)

    d_act.get_activation = get_activation

    class RMSNorm(nn.Module):  # unused by the shipped configs
        def __init__(self, dim, eps, elementwise_affine=True):
            super().__init__()
            self.eps = eps
            self.weight = nn.Parameter(torch.ones(dim)) if elementwise_affine else None

        def forward(self, x):
            var = x.pow(2).mean(-1, keepdim=True)
            x = x * torch.rsqrt(var + self.eps)
            return x * self.weight if self.weight is not None else x

    d_down.RMSNorm = RMSNorm
    d_attn.Attention = _Attention

    class SpatialNorm(nn.Module):  # unused (norm_type="group" everywhere)
        def __init__(self, *a, **k):
            super().__init__()

    d_attn.SpatialNorm = SpatialNorm

    def is_torch_version(op, version):
        from packaging import version as pv
        tv = pv.parse(torch.__version__.split("+")[0])
        other = pv.parse(version)
        return {"<": tv < other, "<=": tv <= other, ">": tv > other,
                ">=": tv >= other, "==": tv == other}[op]

    def deprecate(*args, **kwargs):
        return None

    class _Logger:
        def __getattr__(self, name):
            return lambda *a, **k: None

    logging_mod = types.SimpleNamespace(get_logger=lambda *a, **k: _Logger())

    class BaseOutput(dict):
        def __init__(self, **kwargs):
            super().__init__(**kwargs)
            for k, v in kwargs.items():
                setattr(self, k, v)

    d_utils.is_torch_version = is_torch_version
    d_utils.deprecate = deprecate
    d_utils.logging = logging_mod
    d_utils.BaseOutput = BaseOutput

    def randn_tensor(shape, generator=None, device=None, dtype=None):
        return torch.randn(shape, generator=generator, device=device, dtype=dtype)

    d_tutils.randn_tensor = randn_tensor

    # ---- pieces for the full CVVAEModel wrapper (modeling_vae.py) ----
    d_cfg = _make_module("diffusers.configuration_utils")
    d_mutils = _make_module("diffusers.models.modeling_utils")
    d_autoenc = _make_module("diffusers.models.autoencoders")
    d_vae = _make_module("diffusers.models.autoencoders.vae")
    d_mouts = _make_module("diffusers.models.modeling_outputs")
    d_accel = _make_module("diffusers.utils.accelerate_utils")

    class ConfigMixin:
        pass

    def register_to_config(fn):
        return fn

    d_cfg.ConfigMixin = ConfigMixin
    d_cfg.register_to_config = register_to_config
    d_mutils.ModelMixin = nn.Module
    d_accel.apply_forward_hook = lambda fn: fn

    class DiagonalGaussianDistribution:
        """diffusers' posterior (same math as lvdm's,
        lvdm/modules/distributions/distributions.py:24-74)."""

        def __init__(self, parameters, deterministic=False):
            self.parameters = parameters
            self.mean, self.logvar = torch.chunk(parameters, 2, dim=1)
            self.logvar = torch.clamp(self.logvar, -30.0, 20.0)
            self.std = torch.exp(0.5 * self.logvar)
            self.var = torch.exp(self.logvar)

        def sample(self, generator=None):
            return self.mean + self.std * torch.randn(
                self.mean.shape, generator=generator)

        def mode(self):
            return self.mean

        def kl(self, other=None):
            dims = list(range(1, self.mean.dim()))
            return 0.5 * torch.sum(
                self.mean.pow(2) + self.var - 1.0 - self.logvar, dim=dims)

    class DecoderOutput(BaseOutput):
        pass

    class AutoencoderKLOutput(BaseOutput):
        pass

    d_vae.DiagonalGaussianDistribution = DiagonalGaussianDistribution
    d_vae.DecoderOutput = DecoderOutput
    d_mouts.AutoencoderKLOutput = AutoencoderKLOutput
