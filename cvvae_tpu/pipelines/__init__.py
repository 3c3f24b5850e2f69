from cvvae_tpu.pipelines.diffusion import (  # noqa: F401
    DDIMScheduler, EulerDiscreteScheduler, LatentDiffusionPipeline)
