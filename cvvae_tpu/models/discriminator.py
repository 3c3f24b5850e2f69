"""PatchGAN discriminators (2D and 3D).

Re-designs of the reference nets
[lvdm/modules/autoencoding/lpips/model/model.py:26-257]:

* ``NLayerDiscriminator``   — Pix2Pix 2D PatchGAN (4x4 stride-2 convs +
  BatchNorm + LeakyReLU) applied per-frame.
* ``NLayerDiscriminator3D`` — 3D PatchGAN: conv3d stem, a pyramid of
  ResnetBlockDown3D (avg-pool3d downsample with odd-T first-frame
  duplication, [model.py:157-159,167-169]), GroupNorm+LeakyReLU between
  blocks, conv3d head.  Shipped config: input_nc=3, ndf=64, n_layers=4,
  causal=False, half_3d=False [configs/cvvae_sd3_constraint_training.yaml:74-82].

Init matches the reference's ``weights_init`` (normal(0, 0.02) on conv
weights, [model.py:17-23]).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cvvae_tpu.ops.activations import leaky_relu, silu
from cvvae_tpu.ops.conv import Conv3DSpec, conv3d
from cvvae_tpu.ops.norm import batch_norm_train, group_norm, norm_init
from cvvae_tpu.ops.resample import avg_pool3d

NORM_EPS = 1e-5  # Normalize from model_3d.py (GroupNorm eps 1e-5)


def _gan_conv_init(key, spec: Conv3DSpec, c_in: int, c_out: int,
                   dtype=jnp.float32) -> dict:
    kt, kh, kw = spec.kernel
    k_w, _ = jax.random.split(key)
    return {
        "kernel": 0.02 * jax.random.normal(k_w, (kt, kh, kw, c_in, c_out), dtype),
        "bias": jnp.zeros((c_out,), dtype),
    }


# ---------------------------------------------------------------------------
# 2D PatchGAN (per-frame)  [model.py:26-97]
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Disc2DConfig:
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    #: ActNorm instead of BatchNorm (lpips/util.py:45-104, selected in
    #: model.py:36-42; convs then keep their bias — use_bias is True for
    #: any norm other than BatchNorm2d).  Off in the shipped config.
    use_actnorm: bool = False


def _disc2d_spec(stride: int) -> Conv3DSpec:
    return Conv3DSpec((1, 4, 4), (1, stride, stride),
                      ((0, 0), (1, 1), (1, 1)), ("zero", "zero", "zero"))


def _disc2d_channels(cfg: Disc2DConfig):
    """[(c_in, c_out, stride, has_norm), ...]"""
    layers = [(cfg.input_nc, cfg.ndf, 2, False)]
    nf = 1
    for n in range(1, cfg.n_layers):
        nf_prev, nf = nf, min(2 ** n, 8)
        layers.append((cfg.ndf * nf_prev, cfg.ndf * nf, 2, True))
    nf_prev, nf = nf, min(2 ** cfg.n_layers, 8)
    layers.append((cfg.ndf * nf_prev, cfg.ndf * nf, 1, True))
    layers.append((cfg.ndf * nf, 1, 1, False))
    return layers


def init_disc2d(key, cfg: Disc2DConfig, dtype=jnp.float32) -> dict:
    layers = []
    for i, (c_in, c_out, stride, has_norm) in enumerate(_disc2d_channels(cfg)):
        key, sub = jax.random.split(key)
        layer = {"conv": _gan_conv_init(sub, _disc2d_spec(stride), c_in, c_out,
                                        dtype)}
        if has_norm and cfg.use_actnorm:
            # ActNorm (lpips/util.py:50-57): loc=0, scale=1, lazily
            # data-initialised on the first train forward; the conv
            # keeps its bias (use_bias=True when norm != BatchNorm2d)
            layer["an"] = {
                "loc": jnp.zeros((c_out,), dtype),
                "scale": jnp.ones((c_out,), dtype),
                "initialized": jnp.zeros((), jnp.uint8),
            }
        elif has_norm:
            # BatchNorm2d init from weights_init: weight ~ N(1, 0.02), bias 0
            key, sub = jax.random.split(key)
            layer["bn"] = {
                "scale": 1.0 + 0.02 * jax.random.normal(sub, (c_out,), dtype),
                "bias": jnp.zeros((c_out,), dtype),
                "mean": jnp.zeros((c_out,), dtype),
                "var": jnp.ones((c_out,), dtype),
            }
            # BatchNorm'd convs have no bias in the reference (use_bias=False)
            layer["conv"].pop("bias")
        layers.append(layer)
    return {"layers": layers}


def actnorm(h: jax.Array, an: dict, train: bool):
    """ActNorm forward (lpips/util.py:58-104): per-channel
    ``scale * (h + loc)``.  On the first *train* forward (initialized
    flag 0) loc/scale are set data-dependently to -mean and
    1/(std + 1e-6) over (batch, space) — torch's lazy ``initialize``,
    computed with the unbiased std and under stop_gradient (no_grad).
    Returns (out, updated actnorm params); callers optimising through
    ActNorm should thread the updated params (the flag flips to 1), or
    run one initialising forward before training — matching torch,
    where init mutates the module on the first training_step.
    """
    if train:
        reduce_axes = tuple(range(h.ndim - 1))
        mean = jnp.mean(h, axis=reduce_axes)
        std = jnp.std(h, axis=reduce_axes, ddof=1)
        loc0 = jax.lax.stop_gradient(-mean)
        scale0 = jax.lax.stop_gradient(1.0 / (std + 1e-6))
        use_init = (an["initialized"] == 0)
        loc = jnp.where(use_init, loc0, an["loc"])
        scale = jnp.where(use_init, scale0, an["scale"])
        new = dict(an, loc=loc, scale=scale,
                   initialized=jnp.ones_like(an["initialized"]))
        return scale * (h + loc), new
    return an["scale"] * (h + an["loc"]), an


def apply_disc2d(params: dict, x: jax.Array, cfg: Disc2DConfig,
                 train: bool = True, update_stats: bool = False):
    """x: (B, T, H, W, C) -> per-frame patch logits (B, T, H', W', 1).

    The 2D discriminator sees frames independently (the loss folds T into
    batch, discriminator_loss.py:239-244); we keep T as an axis and use
    (1,4,4) kernels — identical math.  BatchNorm uses batch statistics in
    train mode; with ``update_stats=True`` the call also returns a new
    params tree whose BN running mean/var are advanced with torch's
    momentum-0.1 rule, for the caller to thread through its train state
    (torch mutates ``running_mean``/``running_var`` in place;
    functionally the update is an explicit output).

    NOTE: the shipped training recipe uses the 3D discriminator only
    (configs/cvvae_sd3_constraint_training.yaml:74-82 ->
    NLayerDiscriminator3D), so TrainingEngine never calls this — the 2D
    PatchGAN is API parity for configs that swap it in.  Any such
    training loop MUST call with ``update_stats=True`` and thread the
    returned params, or running stats stay at init and eval-mode reads
    see stale statistics.
    """
    b, t = x.shape[0], x.shape[1]
    h = x.reshape((b * t, 1) + x.shape[2:])  # fold frames for batch stats
    n_layers = len(params["layers"])
    new_layers = []
    for i, layer in enumerate(params["layers"]):
        stride = _disc2d_channels(cfg)[i][2]
        h = conv3d(h, layer["conv"], _disc2d_spec(stride))
        new_layer = layer
        if "an" in layer:
            h, new_an = actnorm(h, layer["an"], train)
            if update_stats:
                new_layer = dict(layer, an=new_an)
        elif "bn" in layer:
            if train:
                h, stats = batch_norm_train(h, layer["bn"])
                if update_stats:
                    new_layer = dict(layer)
                    new_layer["bn"] = dict(layer["bn"], **stats)
            else:
                from cvvae_tpu.ops.norm import batch_norm_inference
                h = batch_norm_inference(h, layer["bn"])
        new_layers.append(new_layer)
        if i < n_layers - 1:
            h = leaky_relu(h, 0.2)
    logits = h.reshape((b, t) + h.shape[2:])
    if update_stats:
        return logits, {"layers": new_layers}
    return logits


# ---------------------------------------------------------------------------
# 3D PatchGAN  [model.py:100-257]
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Disc3DConfig:
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 4
    causal: bool = False
    half_3d: bool = False
    norm_groups: int = 32   # reference Normalize is fixed at 32

    def conv_spec(self, k=3, p=1, stride=(1, 1, 1)) -> Conv3DSpec:
        if self.causal:
            return Conv3DSpec.v1_causal(k, p, stride)
        return Conv3DSpec.v1_plain(k, p, stride)


def _resdown_specs(cfg: Disc3DConfig):
    conv1 = cfg.conv_spec()
    conv2 = Conv3DSpec.spatial2d() if cfg.half_3d else conv1
    return conv1, conv2


def init_resblock_down(key, cfg: Disc3DConfig, c_in: int, c_out: int,
                       dtype=jnp.float32) -> dict:
    conv1_spec, conv2_spec = _resdown_specs(cfg)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "norm1": norm_init(c_in, dtype),
        "conv1": _gan_conv_init(k1, conv1_spec, c_in, c_out, dtype),
        "norm2": norm_init(c_out, dtype),
        "conv2": _gan_conv_init(k2, conv2_spec, c_out, c_out, dtype),
    }
    if c_in != c_out:
        params["nin_shortcut"] = _gan_conv_init(
            k3, Conv3DSpec.pointwise(), c_in, c_out, dtype)
    return params


def _pool_down(h: jax.Array) -> jax.Array:
    """avg_pool3d(k2,s2) with odd-T first-frame duplication
    [model.py:156-159]."""
    if h.shape[1] % 2 == 1:
        h = jnp.concatenate([h[:, :1], h], axis=1)
    return avg_pool3d(h, 2, 2)


def apply_resblock_down(params: dict, x: jax.Array, cfg: Disc3DConfig,
                        downsample: bool = True) -> jax.Array:
    conv1_spec, conv2_spec = _resdown_specs(cfg)
    h = group_norm(x, params["norm1"], num_groups=cfg.norm_groups, eps=NORM_EPS)
    h = silu(h)
    h = conv3d(h, params["conv1"], conv1_spec)
    if downsample:
        h = _pool_down(h)
    h = group_norm(h, params["norm2"], num_groups=cfg.norm_groups, eps=NORM_EPS)
    h = silu(h)
    h = conv3d(h, params["conv2"], conv2_spec)
    if downsample:
        x = _pool_down(x)
    if "nin_shortcut" in params:
        x = conv3d(x, params["nin_shortcut"], Conv3DSpec.pointwise())
    return x + h


def _disc3d_blocks(cfg: Disc3DConfig):
    """[(c_in, c_out, downsample), ...] for the resblock pyramid."""
    blocks = []
    nf = 1
    for n in range(1, cfg.n_layers - 1):
        nf_prev, nf = nf, min(2 ** n, 8)
        blocks.append((cfg.ndf * nf_prev, cfg.ndf * nf, True))
    for _ in range(2):
        nf_prev, nf = nf, min(2 ** cfg.n_layers, 8)
        blocks.append((cfg.ndf * nf_prev, cfg.ndf * nf, False))
    return blocks


def init_disc3d(key, cfg: Disc3DConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 32))
    stem_spec = cfg.conv_spec(stride=(2, 2, 2))
    params = {"stem": _gan_conv_init(next(keys), stem_spec, cfg.input_nc,
                                     cfg.ndf, dtype)}
    blocks, norms = [], []
    for c_in, c_out, _down in _disc3d_blocks(cfg):
        blocks.append(init_resblock_down(next(keys), cfg, c_in, c_out, dtype))
        norms.append(norm_init(c_out, dtype))
    params["blocks"] = blocks
    params["norms"] = norms
    last_c = _disc3d_blocks(cfg)[-1][1]
    params["head"] = _gan_conv_init(next(keys), cfg.conv_spec(), last_c, 1, dtype)
    return params


def get_cvvae_discriminator(key=None, dtype=jnp.float32):
    """The shipped discriminator (reference factory
    models/discriminator.py:get_cvvae_discriminator; config
    cvvae_sd3_constraint_training.yaml:74-82)."""
    cfg = Disc3DConfig(input_nc=3, ndf=64, n_layers=4, causal=False,
                       half_3d=False)
    if key is None:
        return cfg
    return cfg, init_disc3d(key, cfg, dtype)


def apply_disc3d(params: dict, x: jax.Array, cfg: Disc3DConfig) -> jax.Array:
    """x: (B, T, H, W, C) -> patch logits (B, T', H', W', 1)."""
    h = conv3d(x, params["stem"], cfg.conv_spec(stride=(2, 2, 2)))
    h = leaky_relu(h, 0.2)
    for blk, nrm, (_, _, down) in zip(params["blocks"], params["norms"],
                                      _disc3d_blocks(cfg)):
        h = apply_resblock_down(blk, h, cfg, downsample=down)
        h = group_norm(h, nrm, num_groups=cfg.norm_groups, eps=NORM_EPS)
        h = leaky_relu(h, 0.2)
    return conv3d(h, params["head"], cfg.conv_spec())
