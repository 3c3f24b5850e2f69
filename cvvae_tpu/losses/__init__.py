from cvvae_tpu.losses.gan import hinge_d_loss, vanilla_d_loss  # noqa: F401
from cvvae_tpu.losses.vae_loss import LossConfig  # noqa: F401
