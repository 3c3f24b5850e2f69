"""VideoVAE — the user-facing model API (encode / decode / tiling).

Re-designs the reference's CVVAEModel / CVVAESD3Model wrappers
[models/modeling_vae.py:20-668] as a thin stateful handle around pure,
jitted JAX functions.  Capabilities preserved:

* temporal-chunked encode/decode: encode windows of
  ``en_de_n_frames_a_time``+1 frames with a single-frame causal overlap,
  dropping the first latent of later chunks
  [models/modeling_vae.py:193-210]; decode windows of
  ``en_de/time_n_compress``+1 latents [:279-296].
* spatial tiling with linear seam blending: 576-px tiles, 22.22% overlap
  [:144-191, :230-277, :321-341].
* 4D/5D reshape contracts for single-image latent compatibility
  [:216-220, :305-311].
* DiagonalGaussian posterior and the SD2.1 scaling factor 0.18215.

Native layout is channels-last (B, T, H, W, C); ``channels_first=True``
on encode/decode accepts/returns the reference's (B, C, T, H, W).
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

from cvvae_tpu.models import vae_sd3, vae_v1
from cvvae_tpu.ops.distributions import DiagonalGaussian


@dataclasses.dataclass(frozen=True)
class VideoVAEConfig:
    family: str = "v1"                     # "v1" | "sd3"
    net: Any = None                        # VAE1Config | VAESD3Config
    scaling_factor: float = 0.18215
    en_de_n_frames_a_time: Optional[int] = 16
    time_n_compress: int = 4
    spatial_n_compress: int = 8
    tile_spatial_size: Optional[int] = 576
    #: scalar (reference contract) or an (h, w) pair — rectangular tiles
    #: need per-axis ratios so both axes get the exact intended latent
    #: overlap (a single ratio derived from one axis mis-rounds the
    #: other's output overlap and shifts the decoded frame size).
    tile_overlap_ratio: Any = 0.2222
    num_video_frames: Optional[int] = None
    #: encoder-side tile size; "inherit" follows tile_spatial_size
    #: (reference behavior).  The encoder peaks at ~1/5 the decoder's
    #: HBM, so serving configs can run it untiled (None) while the
    #: decoder still tiles — no encode seams, no overlap redundancy
    #: (full-frame 720p encode: 532 ms vs 2x301 ms tiled on v5e int8).
    encode_tile_spatial_size: Any = "inherit"

    def __post_init__(self):
        if self.net is None:
            net = (vae_v1.VAE1Config() if self.family == "v1"
                   else vae_sd3.VAESD3Config())
            object.__setattr__(self, "net", net)
        if self.en_de_n_frames_a_time is not None:
            assert self.en_de_n_frames_a_time % self.time_n_compress == 0

    @property
    def latent_channels(self) -> int:
        return (self.net.z_channels if self.family == "v1"
                else self.net.latent_channels)

    @property
    def decode_n_frames_a_time(self) -> Optional[int]:
        if self.en_de_n_frames_a_time is None:
            return None
        return self.en_de_n_frames_a_time // self.time_n_compress

    @property
    def pixel_tile_size(self):
        t = self.tile_spatial_size
        return tuple(t) if isinstance(t, (tuple, list)) else t

    @property
    def latent_tile_size(self):
        t = self.tile_spatial_size
        if t is None:
            return None
        if isinstance(t, (tuple, list)):
            return tuple(v // self.spatial_n_compress for v in t)
        return t // self.spatial_n_compress

    @property
    def encode_pixel_tile_size(self):
        t = self.encode_tile_spatial_size
        if isinstance(t, str) and t == "inherit":
            return self.pixel_tile_size
        return tuple(t) if isinstance(t, (tuple, list)) else t

    @property
    def encode_latent_tile_size(self):
        t = self.encode_pixel_tile_size
        if t is None:
            return None
        if isinstance(t, (tuple, list)):
            return tuple(v // self.spatial_n_compress for v in t)
        return t // self.spatial_n_compress

    @property
    def num_latent_frames(self) -> Optional[int]:
        if self.num_video_frames is None:
            return None
        return 1 + (self.num_video_frames - 1) // self.time_n_compress


def _blend_h(a: jax.Array, b: jax.Array, overlap: int) -> jax.Array:
    """Linear horizontal seam blend [models/modeling_vae.py:321-330]."""
    w = (jnp.arange(overlap, dtype=jnp.float32) / overlap).reshape(1, 1, 1, -1, 1)
    w = w.astype(b.dtype)
    blended = (1 - w) * a[:, :, :, -overlap:, :] + w * b[:, :, :, :overlap, :]
    return jnp.concatenate([blended, b[:, :, :, overlap:, :]], axis=3)


def _blend_v(a: jax.Array, b: jax.Array, overlap: int) -> jax.Array:
    """Linear vertical seam blend [models/modeling_vae.py:332-341]."""
    w = (jnp.arange(overlap, dtype=jnp.float32) / overlap).reshape(1, 1, -1, 1, 1)
    w = w.astype(b.dtype)
    blended = (1 - w) * a[:, :, -overlap:, :, :] + w * b[:, :, :overlap, :, :]
    return jnp.concatenate([blended, b[:, :, overlap:, :, :]], axis=2)


class VideoVAE:
    """Stateful handle: config + params; all compute is pure & jitted.

    params = {"encoder": ..., "decoder": ...}
    """

    def __init__(self, config: VideoVAEConfig, params: dict):
        self.config = config
        self.params = params
        net = config.net
        if config.family == "v1":
            enc = lambda p, x: vae_v1.apply_encoder(p, x, net)
            dec = lambda p, z: vae_v1.apply_decoder(p, z, net)
        elif config.family == "sd3":
            enc = lambda p, x: vae_sd3.apply_encoder(p, x, net)
            dec = lambda p, z: vae_sd3.apply_decoder(p, z, net)
        else:
            raise ValueError(f"unknown family {config.family}")
        if self._is_quantized(params):
            # int8 convs + the Pallas flash kernel in one program is a
            # ~10x pathology on v5e — trace with exact attention instead
            # (see ops.attention.no_flash_attention)
            from cvvae_tpu.ops.attention import no_flash_attention

            def _noflash(fn):
                def wrapped(p, x):
                    with no_flash_attention():
                        return fn(p, x)
                return wrapped

            enc, dec = _noflash(enc), _noflash(dec)
        self._enc_fn, self._dec_fn = enc, dec
        self._enc = jax.jit(enc)
        self._dec = jax.jit(dec)
        # One jitted program per temporal chunk: the whole spatial tile
        # loop — slicing, (shape-grouped, batched) net calls, seam
        # blending, crop+concat — traces into a single XLA program, so a
        # chunk costs one dispatch instead of O(tiles) round-trips and
        # XLA schedules/fuses across tiles.
        self._sp_enc = jax.jit(lambda p, x: self._spatial_tiled(
            x, lambda v: enc(p, v), config.encode_pixel_tile_size,
            config.encode_latent_tile_size))
        self._sp_dec = jax.jit(lambda p, z: self._spatial_tiled(
            z, lambda v: dec(p, v), config.latent_tile_size,
            config.pixel_tile_size))

    @staticmethod
    def _is_quantized(params) -> bool:
        found = []

        def visit(node):
            if isinstance(node, dict):
                if "kernel_q" in node:
                    found.append(True)
                else:
                    for v in node.values():
                        visit(v)
            elif isinstance(node, (list, tuple)):
                for v in node:
                    visit(v)

        visit(params)
        return bool(found)

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    @classmethod
    def from_config(cls, config: VideoVAEConfig, seed: int = 0,
                    dtype=jnp.float32) -> "VideoVAE":
        key = jax.random.PRNGKey(seed)
        k_e, k_d = jax.random.split(key)
        mod = vae_v1 if config.family == "v1" else vae_sd3
        params = {"encoder": mod.init_encoder(k_e, config.net, dtype),
                  "decoder": mod.init_decoder(k_d, config.net, dtype)}
        return cls(config, params)

    @classmethod
    def from_pretrained(cls, path: str, subfolder: Optional[str] = None,
                        dtype=jnp.float32) -> "VideoVAE":
        """Load a reference HF checkpoint directory (config.json +
        *.safetensors) and convert it to a JAX VideoVAE."""
        from cvvae_tpu.utils.convert import load_reference_checkpoint
        if subfolder:
            path = os.path.join(path, subfolder)
        return load_reference_checkpoint(cls, path, dtype=dtype)

    def astype(self, dtype) -> "VideoVAE":
        params = jax.tree.map(lambda a: a.astype(dtype), self.params)
        return VideoVAE(self.config, params)

    def quantize(self, *, min_cin: int = 64, calibration=None,
                 margin: float = 1.1, skip_paths=()) -> "VideoVAE":
        """int8 serving mode: per-channel weight quantization of the big
        convs (see ops/quant.py); quality-gated vs the bf16 path in
        tests/test_quant.py.

        Activation scales: with ``calibration`` (a (B,T,H,W,3) pixel
        clip — keep it small, e.g. a 17x256x256 window of the video to
        be served: the scales are content statistics, and the pass runs
        eagerly, which holds more intermediates live than a compiled
        program would), one eager encode+decode records per-conv
        activation maxima and bakes
        static scales (* ``margin``) into the params — quantization then
        fuses into each conv's producer instead of costing a separate
        max-reduction pass per conv (the difference between ~1.05x and
        ~1.3x end-to-end on v5e).  Without it, scales are computed
        dynamically per tensor."""
        from cvvae_tpu.ops.quant import (attach_activation_scales,
                                         calibration_scope,
                                         quantize_conv_params)
        qparams = quantize_conv_params(self.params, min_cin=min_cin,
                                       skip_paths=tuple(skip_paths))
        if calibration is None:
            return VideoVAE(self.config, qparams)
        q = VideoVAE(self.config, qparams)
        act_dtype = jax.tree.leaves(self.params)[0].dtype
        x = jnp.asarray(calibration, act_dtype)
        with calibration_scope() as rec:
            moments = q._enc_fn(qparams["encoder"], x)
            z = moments[..., : moments.shape[-1] // 2]
            q._dec_fn(qparams["decoder"], z)
        return VideoVAE(self.config,
                        attach_activation_scales(qparams, rec,
                                                 margin=margin))

    def with_mesh(self, mesh, axis: str = "data",
                  shard_dim: str = "height") -> "VideoVAE":
        """Multi-chip inference: shard one axis of every net call over
        ``mesh`` (params replicated).  XLA's SPMD partitioner inserts the
        conv halo exchanges over ICI — distributed tiling with exact
        seams, beyond the reference's single-device loops (SURVEY §2.3).
        Tiling/chunking semantics are unchanged.

        shard_dim: "height" (spatial, default) or "time" (context /
        sequence parallelism over the frame axis).  The time case
        requires T divisible by the mesh size — padding cannot be hidden
        because GroupNorm statistics span the whole sequence (the convs
        are causal but normalisation is not), so feed mesh-multiple
        windows (e.g. via the streaming pipeline's chunking).  Output
        shardings are left to the compiler: v1's temporal interleave
        gives odd output lengths (4T'-3)."""
        from cvvae_tpu.parallel.mesh import (replicated, spatial_sharding,
                                             temporal_sharding)
        other = VideoVAE(self.config, jax.tree.map(
            lambda a: jax.device_put(a, replicated(mesh)), self.params))
        n_shards = int(mesh.shape[axis])
        if shard_dim == "height":
            sharded = spatial_sharding(mesh, axis)
            enc, dec = other._enc_fn, other._dec_fn
            jit_kw = dict(in_shardings=(None, sharded),
                          out_shardings=sharded)
        elif shard_dim == "time":
            sharded = temporal_sharding(mesh, axis)

            def shard_wrap(fn):
                def wrapped(p, v):
                    t = v.shape[1]
                    if t % n_shards:
                        raise ValueError(
                            f"time-sharding over {n_shards} devices needs "
                            f"T divisible by {n_shards} (got T={t}): "
                            f"GroupNorm statistics span the sequence, so "
                            f"padding would change the numerics — feed "
                            f"mesh-multiple windows")
                    v = jax.lax.with_sharding_constraint(v, sharded)
                    return fn(p, v)
                return wrapped

            enc = shard_wrap(other._enc_fn)
            dec = shard_wrap(other._dec_fn)
            jit_kw = {}
        else:
            raise ValueError(shard_dim)
        other._enc = jax.jit(enc, **jit_kw)
        other._dec = jax.jit(dec, **jit_kw)
        other._sp_enc = jax.jit(
            lambda p, x: other._spatial_tiled(
                x, lambda v: enc(p, v), other.config.encode_pixel_tile_size,
                other.config.encode_latent_tile_size), **jit_kw)
        other._sp_dec = jax.jit(
            lambda p, z: other._spatial_tiled(
                z, lambda v: dec(p, v), other.config.latent_tile_size,
                other.config.pixel_tile_size), **jit_kw)
        return other

    # ------------------------------------------------------------------
    # raw per-window nets
    # ------------------------------------------------------------------

    def _encoder(self, x: jax.Array) -> jax.Array:
        return self._enc(self.params["encoder"], x)

    def _decoder(self, z: jax.Array) -> jax.Array:
        return self._dec(self.params["decoder"], z)

    # ------------------------------------------------------------------
    # spatial tiling  [models/modeling_vae.py:144-191, 230-277]
    # ------------------------------------------------------------------

    def _spatial_tiled(self, x: jax.Array, net, tile,
                       out_tile) -> jax.Array:
        """tile/out_tile: int (square, the reference contract) or an
        (h, w) pair — rectangular tiles let a 1280x720 frame decode as
        two 720x672 tiles (1.05x area) instead of two square 720px ones
        (1.125x)."""
        cfg = self.config
        if tile is None:
            return net(x)
        tile_h, tile_w = (tile, tile) if not isinstance(tile, (tuple, list)) \
            else tile
        if x.shape[2] <= tile_h and x.shape[3] <= tile_w:
            return net(x)
        out_h, out_w = (out_tile, out_tile) \
            if not isinstance(out_tile, (tuple, list)) else out_tile
        ratio = cfg.tile_overlap_ratio
        ratio_h, ratio_w = (ratio, ratio) \
            if not isinstance(ratio, (tuple, list)) else ratio
        in_stride_h = round(tile_h * (1 - ratio_h))
        in_stride_w = round(tile_w * (1 - ratio_w))
        out_overlap_h = round(out_h * ratio_h)
        out_overlap_w = round(out_w * ratio_w)
        out_stride_h = out_h - out_overlap_h
        out_stride_w = out_w - out_overlap_w

        # slice the tile grid
        tile_grid = []
        for i in range(0, x.shape[2], in_stride_h):
            row = []
            for j in range(0, x.shape[3], in_stride_w):
                row.append(x[:, :, i:i + tile_h, j:j + tile_w, :])
                if j + tile_w >= x.shape[3]:
                    break
            tile_grid.append(row)
            if i + tile_h >= x.shape[2]:
                break

        # Group same-shape tiles and run each group through lax.map: the
        # whole grid is still ONE XLA program (one dispatch per chunk),
        # but tiles execute strictly sequentially so peak HBM is a single
        # tile's working set — batching or free-form per-tile calls let
        # the scheduler co-schedule tiles and OOM at 720p — and each
        # distinct tile shape instantiates the net exactly once
        # (compile time ~ #shapes, not #tiles).
        by_shape = {}
        for i, row in enumerate(tile_grid):
            for j, t in enumerate(row):
                by_shape.setdefault(t.shape, []).append((i, j, t))
        rows = [[None] * len(r) for r in tile_grid]
        for shape, entries in by_shape.items():
            if len(entries) == 1:
                i, j, t = entries[0]
                rows[i][j] = net(t)
                continue
            stacked = jnp.stack([t for _, _, t in entries])
            outs = jax.lax.map(net, stacked)
            for k, (i, j, _) in enumerate(entries):
                rows[i][j] = outs[k]

        # The reference's blend_h/blend_v mutate tiles in place
        # [models/modeling_vae.py:321-341], so each tile is blended
        # against already-blended neighbours — replicate that cascade by
        # updating the tile grid as we sweep.
        for i in range(len(rows)):
            for j in range(len(rows[i])):
                t = rows[i][j]
                if i > 0:
                    t = _blend_v(rows[i - 1][j], t, out_overlap_h)
                if j > 0:
                    t = _blend_h(rows[i][j - 1], t, out_overlap_w)
                rows[i][j] = t
        result_rows = rows

        out_rows = []
        for i, cols in enumerate(result_rows):
            for j, t in enumerate(cols):
                if i < len(result_rows) - 1:
                    t = t[:, :, :out_stride_h, :, :]
                if j < len(cols) - 1:
                    t = t[:, :, :, :out_stride_w, :]
                cols[j] = t
            out_rows.append(jnp.concatenate(cols, axis=3))
        return jnp.concatenate(out_rows, axis=2)

    def spatial_tiled_encode(self, x: jax.Array) -> jax.Array:
        return self._sp_enc(self.params["encoder"], x)

    def spatial_tiled_decode(self, z: jax.Array) -> jax.Array:
        return self._sp_dec(self.params["decoder"], z)

    # ------------------------------------------------------------------
    # temporal chunking  [models/modeling_vae.py:193-210, 279-296]
    # ------------------------------------------------------------------

    def tiled_encode(self, x: jax.Array) -> jax.Array:
        stride = self.config.en_de_n_frames_a_time
        if stride is None:
            return self.spatial_tiled_encode(x)
        assert x.ndim == 5
        n_rounds = max(1, math.ceil((x.shape[1] - 1) / stride))
        outs = []
        for n in range(n_rounds):
            z_i = self.spatial_tiled_encode(
                x[:, n * stride:(n + 1) * stride + 1])
            outs.append(z_i if n == 0 else z_i[:, 1:])
        return jnp.concatenate(outs, axis=1)

    def tiled_decode(self, z: jax.Array) -> jax.Array:
        stride = self.config.decode_n_frames_a_time
        if stride is None:
            return self.spatial_tiled_decode(z)
        assert z.ndim == 5
        n_rounds = max(1, math.ceil((z.shape[1] - 1) / stride))
        outs = []
        for n in range(n_rounds):
            x_i = self.spatial_tiled_decode(
                z[:, n * stride:(n + 1) * stride + 1])
            outs.append(x_i if n == 0 else x_i[:, 1:])
        return jnp.concatenate(outs, axis=1)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    @staticmethod
    def _to_tlast(x: jax.Array) -> jax.Array:
        return jnp.transpose(x, (0, 2, 3, 4, 1))  # BCTHW -> BTHWC

    @staticmethod
    def _to_cfirst(x: jax.Array) -> jax.Array:
        return jnp.transpose(x, (0, 4, 1, 2, 3))  # BTHWC -> BCTHW

    def encode(self, x: jax.Array, *, channels_first: bool = False,
               max_batch_size: Optional[int] = None) -> DiagonalGaussian:
        """Encode video -> posterior.  x: (B,T,H,W,C) or BCTHW.

        ``max_batch_size`` chunks the batch axis (the reference's
        `en_and_decode_n_samples_a_time` / `max_batch_size`,
        lvdm/models/diffusion.py:131-161, autoencoder.py:580-592).
        """
        cfg = self.config
        if max_batch_size is not None and x.shape[0] > max_batch_size:
            parts = [self.encode(x[i:i + max_batch_size],
                                 channels_first=channels_first)
                     for i in range(0, x.shape[0], max_batch_size)]
            return DiagonalGaussian(
                jnp.concatenate([p.mean for p in parts], axis=0),
                jnp.concatenate([p.logvar for p in parts], axis=0))
        if channels_first:
            if x.ndim == 4:  # (B,C,H,W) or ((b t),C,H,W)
                if cfg.num_video_frames is not None:
                    t = cfg.num_video_frames
                    b = x.shape[0] // t
                    x = x.reshape(b, t, *x.shape[1:]).transpose(0, 2, 1, 3, 4)
                else:
                    x = x[:, :, None]
            x = self._to_tlast(x)
        elif x.ndim == 4:
            x = x[:, None]  # (B,H,W,C) -> T=1
        moments = self.tiled_encode(x)
        return DiagonalGaussian.from_moments(moments)

    def decode(self, z: jax.Array, *, num_frames: Optional[int] = None,
               channels_first: bool = False,
               max_batch_size: Optional[int] = None) -> jax.Array:
        """Decode latents -> video, same layout convention as input."""
        cfg = self.config
        if max_batch_size is not None and z.shape[0] > max_batch_size:
            return jnp.concatenate(
                [self.decode(z[i:i + max_batch_size], num_frames=num_frames,
                             channels_first=channels_first)
                 for i in range(0, z.shape[0], max_batch_size)], axis=0)
        if channels_first:
            if z.ndim == 4:
                t = num_frames or cfg.num_latent_frames
                if t is not None:
                    b = z.shape[0] // t
                    z = z.reshape(b, t, *z.shape[1:]).transpose(0, 2, 1, 3, 4)
                else:
                    z = z[:, :, None]
            z = self._to_tlast(z)
        elif z.ndim == 4:
            z = z[:, None]
        x = self.tiled_decode(z)
        if channels_first:
            x = self._to_cfirst(x)
        return x

    def reconstruct(self, x: jax.Array, *, key: Optional[jax.Array] = None,
                    sample_posterior: bool = False,
                    channels_first: bool = False) -> jax.Array:
        posterior = self.encode(x, channels_first=channels_first)
        if sample_posterior:
            assert key is not None
            z = posterior.sample(key)
        else:
            z = posterior.mode()
        return self.decode(z, channels_first=channels_first)


# ---------------------------------------------------------------------------
# variant registry (the three shipped checkpoints, README.md:28-31)
# ---------------------------------------------------------------------------

def config_for_variant(variant: str) -> VideoVAEConfig:
    if variant in ("v1", "v1-1", "vae3d", "vae3d_v1-1"):
        return VideoVAEConfig(family="v1")
    if variant in ("sd3", "vae3d_sd3"):
        return VideoVAEConfig(family="sd3", scaling_factor=1.5305)
    raise ValueError(f"unknown variant {variant!r}")
