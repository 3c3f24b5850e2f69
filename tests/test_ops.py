"""Unit tests for the core ops against torch numerics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cvvae_tpu.ops.conv import Conv3DSpec, conv3d
from cvvae_tpu.ops.distributions import DiagonalGaussian
from cvvae_tpu.ops.norm import group_norm, layer_norm
from cvvae_tpu.ops.resample import (
    avg_pool3d, nearest_upsample_2x_spatial, temporal_interleave)


def t2j(x):
    return jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))


def j2t(x):
    return np.asarray(x).transpose(0, 4, 1, 2, 3)


def make_conv_params(w, b=None):
    p = {"kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0))}
    if b is not None:
        p["bias"] = jnp.asarray(b)
    return p


@pytest.mark.parametrize("spec_name,tpad,spad,smode,stride", [
    ("v1_causal", (2, 0), "zeros_p1", "zero", (1, 1, 1)),
    ("sd3_causal", (2, 0), "edge_p1", "edge", (1, 1, 1)),
    ("sd3_plain", (1, 1), "edge_p1", "edge", (1, 1, 1)),
    ("v1_plain", (1, 1), "zeros_p1", "zero", (1, 1, 1)),
])
def test_conv_padding_variants(spec_name, tpad, spad, smode, stride):
    torch.manual_seed(0)
    x = torch.randn(2, 6, 5, 8, 8)
    w = torch.randn(7, 6, 3, 3, 3) * 0.1
    b = torch.randn(7) * 0.1

    # torch reference: manual pad + valid conv
    if spec_name == "v1_plain":
        xp = F.pad(x, (1, 1, 1, 1, 1, 1))
    else:
        mode = "replicate" if smode == "edge" else "constant"
        if spec_name == "v1_causal":
            xp = F.pad(x, (1, 1, 1, 1, 0, 0))          # zeros space
            xp = F.pad(xp, (0, 0, 0, 0, 2, 0), mode="replicate")
        elif spec_name == "sd3_causal":
            xp = F.pad(x, (1, 1, 1, 1, 2, 0), mode="replicate")
        else:  # sd3_plain
            xp = F.pad(x, (1, 1, 1, 1, 1, 1), mode="replicate")
    y_ref = F.conv3d(xp, w, b).numpy()

    spec = getattr(Conv3DSpec, spec_name)()
    y = conv3d(t2j(x), make_conv_params(w.numpy(), b.numpy()), spec)
    np.testing.assert_allclose(j2t(y), y_ref, atol=1e-5)


def test_stacked_stem_matches_general_path():
    """The small-Cin tap-stacked lowering must equal the general conv
    for every padding variant, 2D-on-5D kernels, T=1, and W stride."""
    from cvvae_tpu.ops.conv import _conv3d_stacked_stem

    rng = np.random.RandomState(3)
    for spec, shape in [
        (Conv3DSpec.v1_causal(), (1, 5, 8, 9, 3)),
        (Conv3DSpec.v1_plain(), (2, 4, 7, 8, 4)),
        (Conv3DSpec.sd3_causal(), (1, 5, 8, 9, 3)),
        (Conv3DSpec.sd3_plain(), (1, 3, 6, 6, 4)),
        (Conv3DSpec.spatial2d(), (1, 1, 8, 8, 3)),          # T=1 image
        (Conv3DSpec((3, 3, 3), (1, 1, 2), ((2, 0), (1, 1), (1, 1)),
                    ("edge", "zero", "zero")), (1, 5, 8, 9, 3)),
    ]:
        c_in = shape[-1]
        x = jnp.asarray(rng.randn(*shape), jnp.float32)
        kernel = jnp.asarray(
            rng.randn(*spec.kernel, c_in, 7) * 0.2, jnp.float32)
        y_fast = _conv3d_stacked_stem(x, kernel, spec, None)
        xp = x
        from cvvae_tpu.ops.conv import _edge_pad
        xp = _edge_pad(xp, spec.pads, spec.modes)
        lax_padding = [tuple(p) if m == "zero" else (0, 0)
                       for p, m in zip(spec.pads, spec.modes)]
        y_ref = jax.lax.conv_general_dilated(
            xp, kernel, spec.stride, lax_padding,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                                   atol=2e-5), spec


def test_v1_downsample_padding():
    """Asymmetric (0,1) zero space pad + (2,0) replicate time, stride 2."""
    torch.manual_seed(1)
    x = torch.randn(1, 4, 5, 9, 9)
    w = torch.randn(4, 4, 3, 3, 3) * 0.1
    xp = F.pad(x, (0, 1, 0, 1, 0, 0))
    xp = F.pad(xp, (0, 0, 0, 0, 2, 0), mode="replicate")
    y_ref = F.conv3d(xp, w, stride=2).numpy()
    spec = Conv3DSpec.v1_downsample(down_time=True)
    y = conv3d(t2j(x), make_conv_params(w.numpy()), spec)
    np.testing.assert_allclose(j2t(y), y_ref, atol=1e-5)


def test_group_norm_vs_torch():
    torch.manual_seed(2)
    x = torch.randn(2, 8, 3, 4, 4)
    gn = torch.nn.GroupNorm(4, 8, eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.randn(8))
        gn.bias.copy_(torch.randn(8))
        y_ref = gn(x).numpy()
    params = {"scale": jnp.asarray(gn.weight.detach().numpy()),
              "bias": jnp.asarray(gn.bias.detach().numpy())}
    y = group_norm(t2j(x), params, num_groups=4, eps=1e-6)
    np.testing.assert_allclose(j2t(y), y_ref, atol=1e-5)


def test_layer_norm_vs_torch():
    torch.manual_seed(3)
    x = torch.randn(2, 5, 16)
    ln = torch.nn.LayerNorm(16)
    with torch.no_grad():
        ln.weight.copy_(torch.randn(16))
        ln.bias.copy_(torch.randn(16))
        y_ref = ln(x).numpy()
    params = {"scale": jnp.asarray(ln.weight.detach().numpy()),
              "bias": jnp.asarray(ln.bias.detach().numpy())}
    y = layer_norm(jnp.asarray(x.numpy()), params)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)


def test_nearest_upsample_matches_torch():
    torch.manual_seed(4)
    x = torch.randn(1, 3, 2, 4, 4)
    y_ref = F.interpolate(x, scale_factor=(1.0, 2.0, 2.0), mode="nearest").numpy()
    y = nearest_upsample_2x_spatial(t2j(x))
    np.testing.assert_allclose(j2t(y), y_ref, atol=0)


def test_temporal_interleave_matches_einops():
    """b (n c) t h w -> b c (t n) h w, then drop first frame."""
    from einops import rearrange
    torch.manual_seed(5)
    x = torch.randn(1, 6, 3, 2, 2)  # 6 = n2 * c3
    y_ref = rearrange(x, "b (n c) t h w -> b c (t n) h w", n=2)[:, :, 1:].numpy()
    y = temporal_interleave(t2j(x), 2, drop_first=True)
    np.testing.assert_allclose(j2t(y), y_ref, atol=0)


def test_avg_pool3d_matches_torch():
    torch.manual_seed(6)
    x = torch.randn(1, 3, 4, 6, 6)
    y_ref = F.avg_pool3d(x, kernel_size=2, stride=2).numpy()
    y = avg_pool3d(t2j(x), 2, 2)
    np.testing.assert_allclose(j2t(y), y_ref, atol=1e-6)


def test_diagonal_gaussian_kl_nll():
    rs = np.random.RandomState(0)
    moments = rs.randn(2, 3, 4, 4, 8).astype(np.float32)
    d = DiagonalGaussian.from_moments(jnp.asarray(moments))
    mean = torch.tensor(moments[..., :4])
    logvar = torch.clamp(torch.tensor(moments[..., 4:]), -30, 20)
    var = logvar.exp()
    kl_ref = 0.5 * torch.sum(mean.pow(2) + var - 1 - logvar, dim=[1, 2, 3, 4])
    np.testing.assert_allclose(np.asarray(d.kl()), kl_ref.numpy(), rtol=1e-5)

    sample = rs.randn(2, 3, 4, 4, 4).astype(np.float32)
    nll_ref = 0.5 * torch.sum(
        np.log(2 * np.pi) + logvar
        + (torch.tensor(sample) - mean).pow(2) / var, dim=[1, 2, 3, 4])
    np.testing.assert_allclose(np.asarray(d.nll(jnp.asarray(sample))),
                               nll_ref.numpy(), rtol=1e-5)


def test_sample_statistics():
    moments = np.concatenate([
        np.full((1, 1, 8, 8, 4), 2.0, np.float32),       # mean 2
        np.full((1, 1, 8, 8, 4), np.log(0.25), np.float32)])  # std .5
    d = DiagonalGaussian.from_moments(jnp.asarray(
        np.concatenate([moments[:1][..., :4] * 0 + 2.0,
                        moments[:1][..., :4] * 0 + np.log(0.25)], axis=-1)))
    s = d.sample(jax.random.PRNGKey(0))
    assert abs(float(s.mean()) - 2.0) < 0.1
    assert abs(float(s.std()) - 0.5) < 0.05


def test_upsample2x_conv_matches_naive():
    """Subpixel phase decomposition == conv3d(nearest2x(x)) for every
    padding variant used by the upsample blocks."""
    import jax
    from cvvae_tpu.ops.upsample_conv import upsample2x_conv3x3
    from cvvae_tpu.ops.conv import Conv3DSpec, conv3d
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 5, 6, 7, 8).astype(np.float32))
    params = {"kernel": jnp.asarray(rs.randn(3, 3, 3, 8, 16).astype(np.float32)) * 0.1,
              "bias": jnp.asarray(rs.randn(16).astype(np.float32)) * 0.1}
    for t_pad, t_mode, hw_mode in [((1, 1), "edge", "zero"),   # v1 non-causal
                                   ((2, 0), "edge", "zero"),   # v1 causal
                                   ((1, 1), "edge", "edge"),   # sd3 plain
                                   ((2, 0), "edge", "edge")]:  # sd3 causal
        spec = Conv3DSpec((3, 3, 3), (1, 1, 1),
                          (t_pad, (1, 1), (1, 1)),
                          ("edge", hw_mode, hw_mode))
        naive = conv3d(nearest_upsample_2x_spatial(x), params, spec)
        fused = upsample2x_conv3x3(x, params, t_pad=t_pad, t_mode=t_mode,
                                   hw_mode=hw_mode)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(naive),
                                   atol=2e-5, err_msg=str((t_pad, hw_mode)))


def test_small_cin_conv_matches_lax():
    """The im2col small-Cin lowering (kept for future shapes) must match
    the standard path for every padding variant."""
    from cvvae_tpu.ops.conv import Conv3DSpec, conv3d, _conv3d_small_cin
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 5, 8, 8, 3).astype(np.float32))
    k = jnp.asarray(rs.randn(3, 3, 3, 3, 16).astype(np.float32)) * 0.1
    for spec in (Conv3DSpec.v1_causal(), Conv3DSpec.v1_plain(),
                 Conv3DSpec.sd3_causal(), Conv3DSpec.sd3_plain()):
        ref = conv3d(x, {"kernel": k}, spec)
        got = _conv3d_small_cin(x, k, spec, None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)


def test_psnr_ssim_metrics():
    from cvvae_tpu.utils.metrics import psnr, ssim, reconstruction_report
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 3, 32, 32, 3).astype(np.float32) * 2 - 1)
    assert float(psnr(x, x).min()) > 80
    np.testing.assert_allclose(np.asarray(ssim(x, x)), 1.0, atol=1e-4)
    noisy = x + 0.1 * jnp.asarray(rs.randn(*x.shape).astype(np.float32))
    p = psnr(x, noisy)
    assert 15 < float(p.mean()) < 35
    s = ssim(x, noisy)
    assert 0.0 < float(s.mean()) < 1.0
    rep = reconstruction_report(x, noisy)
    assert set(rep) == {"psnr_db", "ssim", "l1"}


def test_small_cout_lowering_matches_direct():
    """The tap-stack head lowering == direct lax conv for every padding
    family (the dispatcher routes Cout<=8, Cin>=32, stride-1 convs)."""
    from cvvae_tpu.ops.conv import (Conv3DSpec, _conv3d_small_cout, conv3d,
                                    conv_init)
    from jax import lax
    for spec in (Conv3DSpec.v1_causal(), Conv3DSpec.v1_plain(),
                 Conv3DSpec.sd3_causal(), Conv3DSpec.sd3_plain(),
                 Conv3DSpec.spatial2d()):
        params = conv_init(jax.random.PRNGKey(0), spec, 32, 3)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 12, 10, 32))
        y = conv3d(x, params, spec)  # dispatcher -> small_cout path
        # direct reference: edge-pad + lax conv
        from cvvae_tpu.ops.conv import _edge_pad
        xp = _edge_pad(x, spec.pads, spec.modes)
        lax_padding = [tuple(p) if m == "zero" else (0, 0)
                       for p, m in zip(spec.pads, spec.modes)]
        y_ref = lax.conv_general_dilated(
            xp, params["kernel"], spec.stride, lax_padding,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        y_ref = y_ref + params["bias"]
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=3e-5, rtol=1e-4)
