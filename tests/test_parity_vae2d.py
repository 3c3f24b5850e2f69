"""Golden parity: 2D constraint nets vs the reference per-frame 2D VAE
(lvdm/modules/diffusionmodules/vae_models_sd3.py DecoderWith3DWrapper /
Encoder) — the frozen nets of the latent-constraint training recipe."""

import sys
import types

import numpy as np
import pytest

import tests.torch_ref as tr

if not tr.reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cvvae_tpu.models import vae2d  # noqa: E402
from cvvae_tpu.utils.convert import convert_state_dict  # noqa: E402


@pytest.fixture(scope="module")
def ref2d():
    """Import the 2D module files directly under a synthetic package (the
    real lvdm package __init__ pulls in pytorch_lightning)."""
    import importlib
    from tests.torch_ref import stubs
    stubs.install()
    pkg = types.ModuleType("ref2d")
    pkg.__path__ = ["/root/reference/lvdm/modules/diffusionmodules"]
    sys.modules["ref2d"] = pkg
    return importlib.import_module("ref2d.vae_models_sd3")


CFG = vae2d.VAE2DConfig(naming="sd3", latent_channels=16,
                        block_out_channels=(32, 64, 64, 64),
                        layers_per_block=2)


def to_tree(module):
    sd = {f"m.{k}": v for k, v in module.state_dict().items()}
    tree, skipped = convert_state_dict(sd, prefixes=("m",))
    assert not skipped
    return tree["m"]


def t2j(x):
    return jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))


def j2t(x):
    return np.asarray(x).transpose(0, 4, 1, 2, 3)


def test_decoder2d_wrapper_parity(ref2d):
    torch.manual_seed(0)
    dec = ref2d.DecoderWith3DWrapper(
        in_channels=16, out_channels=3,
        up_block_types=["UpDecoderBlock2D"] * 4,
        block_out_channels=[32, 64, 64, 64], layers_per_block=2,
        norm_num_groups=32, act_fn="silu",
        mid_block_add_attention=True).eval()
    z = torch.randn(1, 16, 3, 4, 4)  # 5D -> per-frame decode
    with torch.no_grad():
        x_ref = dec(z).numpy()
    x = vae2d.apply_decoder2d(to_tree(dec), t2j(z), CFG)
    assert x.shape == (1, 3, 32, 32, 3)
    np.testing.assert_allclose(j2t(x), x_ref, atol=3e-4, rtol=1e-3)


@pytest.mark.slow
def test_encoder2d_parity(ref2d):
    torch.manual_seed(1)
    enc = ref2d.Encoder(
        in_channels=3, out_channels=16,
        down_block_types=["DownEncoderBlock2D"] * 4,
        block_out_channels=[32, 64, 64, 64], layers_per_block=2,
        norm_num_groups=32, act_fn="silu", double_z=True,
        mid_block_add_attention=True).eval()
    x = torch.randn(2, 3, 32, 32)  # 4D single frames
    with torch.no_grad():
        m_ref = enc(x).numpy()
    m = vae2d.apply_encoder2d(to_tree(enc),
                              t2j(x[:, :, None]), CFG)
    assert m.shape == (2, 1, 4, 4, 32)
    np.testing.assert_allclose(j2t(m)[:, :, 0], m_ref, atol=3e-4, rtol=1e-3)


@pytest.fixture(scope="module")
def ref2d_sd21():
    """The stock SD2.1 2D nets (lvdm/modules/diffusionmodules/model.py)
    via a synthetic package tree that bypasses lvdm/__init__."""
    import importlib
    from tests.torch_ref import stubs
    stubs.install()
    for name, path in [("reflvdm", "/root/reference/lvdm"),
                       ("reflvdm.modules", "/root/reference/lvdm/modules"),
                       ("reflvdm.modules.diffusionmodules",
                        "/root/reference/lvdm/modules/diffusionmodules")]:
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            sys.modules[name] = pkg
    return importlib.import_module("reflvdm.modules.diffusionmodules.model")


CFG21 = vae2d.VAE2DConfig(naming="sd21", latent_channels=4,
                          block_out_channels=(32, 64, 64, 64),
                          layers_per_block=2, legacy_quant_conv=True)


def test_sd21_decoder_wrapper_parity(ref2d_sd21):
    torch.manual_seed(2)
    dec = ref2d_sd21.DecoderWith3DWrapper(
        ch=32, out_ch=3, ch_mult=(1, 2, 2, 2), num_res_blocks=2,
        attn_resolutions=[], in_channels=3, resolution=32, z_channels=4,
        attn_type="vanilla", legacy=True).eval()
    z = torch.randn(1, 4, 3, 4, 4)
    with torch.no_grad():
        x_ref = dec(z).numpy()
    x = vae2d.apply_decoder2d(to_tree(dec), t2j(z), CFG21)
    assert x.shape == (1, 3, 32, 32, 3)
    np.testing.assert_allclose(j2t(x), x_ref, atol=3e-4, rtol=1e-3)


def test_sd21_encoder_wrapper_parity(ref2d_sd21):
    torch.manual_seed(3)
    enc = ref2d_sd21.EncoderWith3DWrapper(
        ch=32, out_ch=3, ch_mult=(1, 2, 2, 2), num_res_blocks=2,
        attn_resolutions=[], in_channels=3, resolution=32, z_channels=4,
        attn_type="vanilla", legacy=True).eval()
    x = torch.randn(1, 3, 3, 32, 32)
    with torch.no_grad():
        m_ref = enc(x).numpy()
    m = vae2d.apply_encoder2d(to_tree(enc), t2j(x), CFG21)
    assert m.shape == (1, 3, 4, 4, 8)
    np.testing.assert_allclose(j2t(m), m_ref, atol=3e-4, rtol=1e-3)
