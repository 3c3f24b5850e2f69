"""cvvae_tpu — a TPU-native video VAE framework.

A from-scratch JAX/XLA/Pallas implementation of a *compatible video VAE*:
a 3D (spatiotemporal) KL-VAE that compresses video 4x in time and 8x in
space into a latent space aligned with existing image VAEs (SD 2.1/SVD
4-channel latents and SD3/SD3.5 16-channel latents), so pretrained
image/video diffusion models can run on its latents unchanged.

Capability parity target: AILab-CVC/CV-VAE (NeurIPS 2024).  Behavioral
contracts are cited per-module against the reference as `file:line`
(paths relative to the reference repo).  The implementation is TPU-first:
channels-last layouts, XLA convolutions on the MXU, fp32 norms/softmax
with bf16 compute, `jax.sharding` meshes for scale-out, and Pallas
kernels for fused hot ops.
"""

__version__ = "0.1.0"

from cvvae_tpu.models.video_vae import VideoVAE  # noqa: F401
