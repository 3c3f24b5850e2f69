"""Engine construction guards (fast — no jit compiles).

The reference downloads + md5-checks pretrained LPIPS weights
(lvdm/modules/autoencoding/lpips/util.py:16-43) and therefore never
trains against an uncalibrated perceptual metric; our engine must
refuse to do so silently.
"""

import pytest

from cvvae_tpu.losses.vae_loss import LossConfig
from cvvae_tpu.models.discriminator import Disc3DConfig
from cvvae_tpu.models.vae_sd3 import VAESD3Config
from cvvae_tpu.training.engine import EngineConfig, TrainingEngine
from cvvae_tpu.training.optim import OptimConfig


def _cfg(pw):
    return EngineConfig(
        family="sd3",
        net=VAESD3Config(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                         latent_channels=4, norm_num_groups=4),
        disc=Disc3DConfig(ndf=8, n_layers=2, norm_groups=4),
        loss=LossConfig(perceptual_weight=pw),
        optim=OptimConfig(num_warmup_steps=0, num_training_steps=10),
        constraint="none", remat=False)


def test_random_lpips_raises_by_default():
    with pytest.raises(ValueError, match="LPIPS"):
        TrainingEngine(_cfg(0.5), seed=0)


def test_random_lpips_allowed_with_explicit_optin():
    with pytest.warns(UserWarning, match="RANDOM-INIT"):
        eng = TrainingEngine(_cfg(0.5), allow_random_lpips=True, seed=0)
    assert eng.frozen["lpips"] is not None


def test_no_perceptual_weight_needs_no_lpips():
    eng = TrainingEngine(_cfg(0.0), seed=0)
    assert eng.frozen["lpips"] is None


def test_pretrained_lpips_params_accepted():
    import jax
    from cvvae_tpu.models.lpips import init_lpips

    params = init_lpips(jax.random.PRNGKey(1))
    eng = TrainingEngine(_cfg(0.5), lpips_params=params, seed=0)
    assert eng.frozen["lpips"] is params
