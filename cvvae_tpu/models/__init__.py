from cvvae_tpu.models.video_vae import VideoVAE, VideoVAEConfig  # noqa: F401
