from cvvae_tpu.ops.conv import Conv3DSpec, conv3d, conv_init
from cvvae_tpu.ops.norm import group_norm, layer_norm
from cvvae_tpu.ops.activations import silu
from cvvae_tpu.ops.resample import (
    nearest_upsample_2x_spatial,
    temporal_interleave,
)
from cvvae_tpu.ops.distributions import DiagonalGaussian
