"""int8 quantized-inference tests: numerics vs the fp path + the
end-to-end quality gate (PSNR budget) on a small net."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cvvae_tpu.ops.conv import Conv3DSpec, conv3d, conv_init
from cvvae_tpu.ops.quant import (
    dequantize_kernel, quantize_act, quantize_conv_params, quantize_kernel)


def test_kernel_quant_roundtrip():
    k = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 3, 64, 32))
    kq, s = quantize_kernel(k)
    assert kq.dtype == jnp.int8 and s.shape == (32,)
    err = np.abs(np.asarray(dequantize_kernel({"kernel_q": kq, "scale_w": s}))
                 - np.asarray(k))
    # symmetric 8-bit: max error is half an LSB = scale/2 per channel
    assert (err <= np.asarray(s) / 2 + 1e-7).all()


def test_act_quant_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8, 8, 16),
                          jnp.bfloat16)
    xq, s = quantize_act(x)
    assert xq.dtype == jnp.int8
    back = np.asarray(xq, np.float32) * float(s)
    np.testing.assert_allclose(back, np.asarray(x, np.float32),
                               atol=float(s) / 2 + 1e-6)


@pytest.mark.parametrize("spec", [
    Conv3DSpec.v1_causal(), Conv3DSpec.sd3_plain(),
    Conv3DSpec.v1_downsample(down_time=True)])
def test_conv3d_quantized_close_to_fp(spec):
    key = jax.random.PRNGKey(2)
    params = conv_init(key, spec, 64, 32)
    x = jax.random.normal(key, (1, 5, 10, 10, 64)) * 0.5
    y_fp = np.asarray(conv3d(x, params, spec))
    y_q = np.asarray(conv3d(x, quantize_conv_params(params, min_cin=1),
                            spec))
    rel = np.abs(y_q - y_fp).mean() / (np.abs(y_fp).mean() + 1e-9)
    assert rel < 0.02, rel


def test_quantize_skips_stems_and_heads():
    stem = conv_init(jax.random.PRNGKey(3), Conv3DSpec.v1_causal(), 3, 128)
    head = conv_init(jax.random.PRNGKey(4), Conv3DSpec.v1_plain(), 128, 3)
    body = conv_init(jax.random.PRNGKey(5), Conv3DSpec.v1_plain(), 128, 128)
    tree = {"stem": stem, "head": head, "body": body}
    q = quantize_conv_params(tree)
    assert "kernel" in q["stem"] and "kernel" in q["head"]
    assert "kernel_q" in q["body"]


def test_upsample_interleave_quantized():
    from cvvae_tpu.ops.upsample_conv import upsample2x_conv3x3_interleave
    key = jax.random.PRNGKey(6)
    for n in (1, 2):
        params = {"kernel": jax.random.normal(key, (3, 3, 3, 64, 64 * n)) * .1,
                  "bias": jax.random.normal(key, (64 * n,)) * .1}
        x = jax.random.normal(key, (1, 3, 8, 8, 64))
        y_fp = np.asarray(upsample2x_conv3x3_interleave(
            x, params, n=n, t_pad=(1, 1), t_mode="edge"))
        y_q = np.asarray(upsample2x_conv3x3_interleave(
            x, quantize_conv_params(params, min_cin=1), n=n,
            t_pad=(1, 1), t_mode="edge"))
        rel = np.abs(y_q - y_fp).mean() / (np.abs(y_fp).mean() + 1e-9)
        assert rel < 0.03, (n, rel)


def test_videovae_int8_quality_gate():
    """int8 roundtrip must stay within the documented PSNR budget of the
    fp32 roundtrip (>= 30 dB agreement on a random-init net — random
    weights are a *harder* quantization target than trained ones:
    activations are less concentrated)."""
    from cvvae_tpu.models.vae_v1 import VAE1Config
    from cvvae_tpu.models.video_vae import VideoVAE, VideoVAEConfig
    from cvvae_tpu.utils.metrics import psnr

    cfg = VideoVAEConfig(
        family="v1",
        net=VAE1Config(ch=64, ch_mult=(1, 2), num_res_blocks=1,
                       z_channels=4, norm_num_groups=32),
        tile_spatial_size=None, en_de_n_frames_a_time=None)
    vae = VideoVAE.from_config(cfg, seed=0)
    vae_q = vae.quantize()
    # some convs actually quantized
    leaves_q = jax.tree_util.tree_leaves(
        jax.tree.map(lambda a: a.dtype == jnp.int8, vae_q.params))
    assert any(np.asarray(l) for l in leaves_q)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 32, 32, 3)) * 0.5
    r_fp = vae.reconstruct(x)
    r_q = vae_q.reconstruct(x)
    agreement_db = float(jnp.mean(psnr(r_fp, r_q,
                                       data_range=float(jnp.max(jnp.abs(r_fp)) * 2))))
    assert agreement_db >= 30.0, agreement_db


def test_conv3d_int8_static_scale_matches_dynamic():
    """With scale_x set to the dynamic max-scale, the static path is
    bit-identical to dynamic quantization."""
    from cvvae_tpu.ops.quant import conv3d_int8
    spec = Conv3DSpec.v1_plain()
    params = quantize_conv_params(
        conv_init(jax.random.PRNGKey(0), spec, 64, 64), min_cin=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 64, 64, 64),
                          jnp.bfloat16)
    y_dyn = conv3d_int8(x, params, spec)
    sx = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0, 1e-12)
    y_static = conv3d_int8(x, dict(params, scale_x=sx), spec)
    np.testing.assert_array_equal(np.asarray(y_dyn), np.asarray(y_static))


def test_videovae_calibrated_int8():
    """quantize(calibration=...) bakes static scales; the static-scale
    roundtrip stays within the PSNR budget and matches the dynamic int8
    path closely."""
    from cvvae_tpu.models.vae_v1 import VAE1Config
    from cvvae_tpu.models.video_vae import VideoVAE, VideoVAEConfig
    from cvvae_tpu.utils.metrics import psnr

    cfg = VideoVAEConfig(
        family="v1",
        net=VAE1Config(ch=64, ch_mult=(1, 2), num_res_blocks=1,
                       z_channels=4, norm_num_groups=32),
        tile_spatial_size=None, en_de_n_frames_a_time=None)
    vae = VideoVAE.from_config(cfg, seed=0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 96, 96, 3)) * 0.5

    vae_static = vae.quantize(calibration=x)
    n_scales = len([l for l in jax.tree_util.tree_leaves(
        jax.tree.map(lambda a: getattr(a, "ndim", None) == 0,
                     vae_static.params)) if np.asarray(l)])
    assert n_scales > 0, "no static scales attached"

    r_fp = np.asarray(vae.reconstruct(x))
    r_static = np.asarray(vae_static.reconstruct(x))
    rng = float(np.max(np.abs(r_fp))) * 2
    static_db = float(jnp.mean(psnr(jnp.asarray(r_fp),
                                    jnp.asarray(r_static), data_range=rng)))
    assert static_db >= 30.0, static_db

    # on an unseen clip from the same distribution the calibrated scales
    # must still hold up (margin headroom)
    x2 = jax.random.normal(jax.random.PRNGKey(7), (1, 5, 96, 96, 3)) * 0.5
    r_fp2 = np.asarray(vae.reconstruct(x2))
    r_s2 = np.asarray(vae_static.reconstruct(x2))
    rng2 = float(np.max(np.abs(r_fp2))) * 2
    db2 = float(jnp.mean(psnr(jnp.asarray(r_fp2), jnp.asarray(r_s2),
                              data_range=rng2)))
    assert db2 >= 28.0, db2


def test_calibration_requires_eager():
    from cvvae_tpu.ops.quant import calibration_scope, maybe_record_act
    params = quantize_conv_params(
        conv_init(jax.random.PRNGKey(0), Conv3DSpec.v1_plain(), 64, 64),
        min_cin=1)

    @jax.jit
    def f(x):
        maybe_record_act(params, x)
        return x

    with calibration_scope():
        with pytest.raises(RuntimeError, match="eagerly"):
            f(jnp.ones((1, 2, 4, 4, 64)))
