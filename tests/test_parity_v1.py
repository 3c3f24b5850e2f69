"""Golden-value parity: v1 nets vs the reference PyTorch implementation.

Runs the actual reference code (models/vae_models.py) on CPU torch with
shared weights and compares activations.  Narrow nets (ch=32) keep CPU
runtime sane while exercising every block type, both time-downsample
variants, attention, and the causal/non-causal padding paths.
"""

import numpy as np
import pytest

import tests.torch_ref as tr

if not tr.reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cvvae_tpu.models import vae_v1  # noqa: E402
from cvvae_tpu.utils.convert import convert_state_dict  # noqa: E402

ATOL = 3e-4
CFG = vae_v1.VAE1Config(ch=32, z_channels=4)


def to_tree(module):
    sd = {f"m.{k}": v for k, v in module.state_dict().items()}
    tree, skipped = convert_state_dict(sd, prefixes=("m",))
    assert not skipped
    return tree["m"]


def t2j(x):  # BCTHW -> BTHWC
    return jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))


def j2t(x):  # BTHWC -> BCTHW numpy
    return np.asarray(x).transpose(0, 4, 1, 2, 3)


@pytest.fixture(scope="module")
def ref():
    return tr.load_reference_module("models.vae_models")


@pytest.mark.slow
def test_encoder_parity(ref):
    torch.manual_seed(0)
    enc = ref.Encoder(
        ch=32, out_ch=3, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
        attn_resolutions=[], dropout=0.0, in_channels=3, z_channels=4,
        double_z=True, attn_type="vanilla-xformers", use_3d_conv=True,
        half_3d=True, causal=True).eval()
    x = torch.randn(1, 3, 5, 16, 16)
    with torch.no_grad():
        y_ref = enc(x).numpy()

    y = vae_v1.apply_encoder(to_tree(enc), t2j(x), CFG)
    assert y.shape == (1, 2, 2, 2, 8)
    np.testing.assert_allclose(j2t(y), y_ref, atol=ATOL, rtol=1e-3)


@pytest.mark.slow
def test_decoder_parity(ref):
    torch.manual_seed(1)
    dec = ref.Decoder(
        ch=32, out_ch=3, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
        attn_resolutions=[], dropout=0.0, in_channels=3, z_channels=4,
        double_z=True, attn_type="spatial-temporal-xformer", use_3d_conv=True,
        half_3d=True, causal=False).eval()
    z = torch.randn(1, 4, 2, 2, 2)
    with torch.no_grad():
        x_ref = dec(z).numpy()

    x = vae_v1.apply_decoder(to_tree(dec), t2j(z), CFG)
    assert x.shape == (1, 5, 16, 16, 3)
    np.testing.assert_allclose(j2t(x), x_ref, atol=ATOL, rtol=1e-3)


def test_causal_conv_is_causal():
    """The causal conv pads the past only: changing future frames must not
    affect earlier outputs.  (The full encoder is *not* strictly causal —
    the reference's GroupNorm statistics span all frames, a property we
    deliberately preserve.)"""
    import jax
    from cvvae_tpu.ops.conv import Conv3DSpec, conv3d, conv_init
    spec = Conv3DSpec.v1_causal()
    params = conv_init(jax.random.PRNGKey(0), spec, 8, 8)
    x = np.random.RandomState(0).randn(1, 9, 4, 4, 8).astype(np.float32)
    y1 = conv3d(jnp.asarray(x), params, spec)
    x2 = x.copy()
    x2[:, 5:] += 10.0
    y2 = conv3d(jnp.asarray(x2), params, spec)
    np.testing.assert_allclose(np.asarray(y1[:, :5]), np.asarray(y2[:, :5]),
                               atol=1e-6)
    assert np.abs(np.asarray(y1[:, 5:]) - np.asarray(y2[:, 5:])).max() > 1.0


def test_encoder_parity_2d_only(ref):
    """use_3d_conv=False: every conv is a per-frame 2D conv
    (models/vae_models.py:714-715)."""
    torch.manual_seed(4)
    enc = ref.Encoder(
        ch=32, out_ch=3, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
        attn_resolutions=[], dropout=0.0, in_channels=3, z_channels=4,
        double_z=True, attn_type="vanilla-xformers", use_3d_conv=False,
        half_3d=True, causal=True).eval()
    x = torch.randn(1, 3, 5, 16, 16)
    with torch.no_grad():
        y_ref = enc(x).numpy()
    cfg2d = vae_v1.VAE1Config(ch=32, z_channels=4, num_res_blocks=1,
                              use_3d_conv=False)
    y = vae_v1.apply_encoder(to_tree(enc), t2j(x), cfg2d)
    np.testing.assert_allclose(j2t(y), y_ref, atol=ATOL, rtol=1e-3)


def test_level_attention_parity(ref):
    """attn_resolutions non-empty: per-block attention at matching levels
    (models/vae_models.py:744-745, 926-927)."""
    torch.manual_seed(5)
    enc = ref.Encoder(
        ch=32, out_ch=3, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
        attn_resolutions=[8], resolution=16, dropout=0.0, in_channels=3,
        z_channels=4, double_z=True, attn_type="vanilla-xformers",
        use_3d_conv=True, half_3d=True, causal=True).eval()
    x = torch.randn(1, 3, 5, 16, 16)
    with torch.no_grad():
        y_ref = enc(x).numpy()
    cfg = vae_v1.VAE1Config(ch=32, z_channels=4, num_res_blocks=1,
                            attn_resolutions=(8,), resolution=16)
    tree = to_tree(enc)
    assert "attn" in tree["down"][1]  # level1: curr_res 8
    y = vae_v1.apply_encoder(tree, t2j(x), cfg)
    np.testing.assert_allclose(j2t(y), y_ref, atol=ATOL, rtol=1e-3)

    torch.manual_seed(6)
    dec = ref.Decoder(
        ch=32, out_ch=3, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
        attn_resolutions=[8], resolution=16, dropout=0.0, in_channels=3,
        z_channels=4, double_z=True, attn_type="spatial-temporal-xformer",
        use_3d_conv=True, half_3d=True, causal=False).eval()
    z = torch.randn(1, 4, 2, 2, 2)
    with torch.no_grad():
        x_ref = dec(z).numpy()
    xj = vae_v1.apply_decoder(to_tree(dec), t2j(z), cfg)
    np.testing.assert_allclose(j2t(xj), x_ref, atol=ATOL, rtol=1e-3)
