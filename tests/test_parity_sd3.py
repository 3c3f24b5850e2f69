"""Golden-value parity: SD3 nets vs the reference PyTorch implementation
(models/vae_models3d_sd3.py, models/vae_blocks3d_sd3.py)."""

import numpy as np
import pytest

import tests.torch_ref as tr

if not tr.reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cvvae_tpu.models import vae_sd3  # noqa: E402
from cvvae_tpu.utils.convert import convert_state_dict  # noqa: E402

ATOL = 3e-4
CFG = vae_sd3.VAESD3Config(block_out_channels=(32, 64, 64, 64),
                           layers_per_block=2, latent_channels=16)
BLOCKS = ["DownEncoderBlock3D"] * 4
UPBLOCKS = ["UpDecoderBlock3D"] * 4


def to_tree(module):
    sd = {f"m.{k}": v for k, v in module.state_dict().items()}
    tree, skipped = convert_state_dict(sd, prefixes=("m",))
    assert not skipped
    return tree["m"]


def t2j(x):
    return jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))


def j2t(x):
    return np.asarray(x).transpose(0, 4, 1, 2, 3)


@pytest.fixture(scope="module")
def ref():
    return tr.load_reference_module("models.vae_models3d_sd3")


@pytest.mark.slow
def test_encoder3d_parity(ref):
    torch.manual_seed(0)
    enc = ref.Encoder3D(
        in_channels=3, out_channels=16, down_block_types=BLOCKS,
        block_out_channels=[32, 64, 64, 64], layers_per_block=2,
        norm_num_groups=32, act_fn="silu", double_z=True,
        mid_block_add_attention=True, causal=True, half_3d=True).eval()
    x = torch.randn(1, 3, 5, 16, 16)
    with torch.no_grad():
        y_ref = enc(x).numpy()
    y = vae_sd3.apply_encoder(to_tree(enc), t2j(x), CFG)
    assert y.shape == (1, 2, 2, 2, 32)
    np.testing.assert_allclose(j2t(y), y_ref, atol=ATOL, rtol=1e-3)


@pytest.mark.slow
def test_decoder3d_parity(ref):
    torch.manual_seed(1)
    dec = ref.Decoder3D(
        in_channels=16, out_channels=3, up_block_types=UPBLOCKS,
        block_out_channels=[32, 64, 64, 64], layers_per_block=2,
        norm_num_groups=32, act_fn="silu", mid_block_add_attention=True,
        causal=False, half_3d=True).eval()
    z = torch.randn(1, 16, 2, 2, 2)
    with torch.no_grad():
        x_ref = dec(z).numpy()
    x = vae_sd3.apply_decoder(to_tree(dec), t2j(z), CFG)
    assert x.shape == (1, 5, 16, 16, 3)
    np.testing.assert_allclose(j2t(x), x_ref, atol=ATOL, rtol=1e-3)
