"""SD 2.1 + 3D-VAE latent-compat demo — the reference notebook flow
(sd21_vae3d_inference.ipynb) as a script.

Samples image latents with a converted diffusers UNet, then decodes the
SAME latents two ways: through the 2D SD VAE decoder and through the 3D
CV-VAE (decode(z / scaling_factor, num_frames=1)) — demonstrating the
latent-space compatibility contract side by side.

Usage:
  python scripts/sd21_vae3d_inference.py \
      --unet_path  /ckpts/sd21/unet \
      --vae3d_path /ckpts/cv-vae [--subfolder vae3d] \
      [--vae2d_path /ckpts/sd21/vae] \
      [--text_encoder_path /ckpts/sd21/text_encoder --prompt "..."] \
      [--steps 50 --guidance 7.5 --height 512 --width 512] \
      [--out out.png]

Without --text_encoder_path the context is a fixed random embedding
(structure demo); with it, the prompt is tokenized by transformers'
CLIPTokenizer (pure Python) and encoded by the in-framework JAX CLIP
text model (models/clip_text.py + utils/convert.py) — the whole
prompted flow runs as JAX programs, matching the reference pipeline
(pipeline_stable_diffusion.py:302-427) without torch at sample time.
"""

import argparse

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--unet_path", required=True)
    ap.add_argument("--vae3d_path", required=True)
    ap.add_argument("--subfolder", default=None)
    ap.add_argument("--vae2d_path", default=None)
    ap.add_argument("--text_encoder_path", default=None)
    ap.add_argument("--tokenizer_path", default=None)
    ap.add_argument("--prompt", default="a photograph of an astronaut "
                                        "riding a horse")
    ap.add_argument("--negative_prompt", default="")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, default=7.5)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="sd21_vae3d.png")
    args = ap.parse_args()

    from cvvae_tpu.models.unet2d import make_denoiser
    from cvvae_tpu.models.video_vae import VideoVAE
    from cvvae_tpu.pipelines.diffusion import (
        DDIMScheduler, LatentDiffusionPipeline)
    from cvvae_tpu.utils.convert import load_unet_checkpoint
    from cvvae_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    unet_params, unet_cfg = load_unet_checkpoint(args.unet_path,
                                                 dtype=jnp.bfloat16)
    vae3d = VideoVAE.from_pretrained(args.vae3d_path,
                                     subfolder=args.subfolder,
                                     dtype=jnp.bfloat16)

    if args.text_encoder_path:
        # tokenize with transformers' CLIPTokenizer (pure Python), encode
        # with the in-framework JAX CLIP (models/clip_text.py) - no torch
        # at sample time; the reference flow is
        # pipeline_stable_diffusion.py:302-427
        from transformers import CLIPTokenizer

        from cvvae_tpu.models.clip_text import make_text_embedder
        from cvvae_tpu.utils.convert import load_clip_text_checkpoint
        tok = CLIPTokenizer.from_pretrained(
            args.tokenizer_path or args.text_encoder_path)
        te_params, te_cfg = load_clip_text_checkpoint(
            args.text_encoder_path, dtype=jnp.bfloat16)
        embedder = make_text_embedder(te_params, te_cfg)

        def embed(text):
            ids = tok(text, padding="max_length",
                      max_length=te_cfg.max_position_embeddings,
                      truncation=True, return_tensors="np").input_ids
            return embedder(jnp.asarray(ids, jnp.int32)).astype(jnp.float32)

        cond, uncond = embed(args.prompt), embed(args.negative_prompt)
    else:
        print("[demo] no text encoder given - using a fixed random context")
        k = jax.random.PRNGKey(1)
        cond = jax.random.normal(k, (1, 77, unet_cfg.cross_attention_dim))
        uncond = jnp.zeros_like(cond)

    pipe = LatentDiffusionPipeline(vae3d, make_denoiser(unet_params, unet_cfg),
                                   scheduler=DDIMScheduler())
    latents = pipe(jax.random.PRNGKey(args.seed), cond=cond, uncond=uncond,
                   height=args.height, width=args.width,
                   num_inference_steps=args.steps,
                   guidance_scale=args.guidance, output_type="latent")

    # decode the SAME latents through the 3D VAE (reference contract)
    frame3d = np.asarray(pipe.decode_latents(latents).astype(jnp.float32))[0]
    panels = [frame3d]

    if args.vae2d_path:  # side-by-side with the original 2D SD VAE
        from cvvae_tpu.models.vae2d import VAE2DConfig, apply_decoder2d
        from cvvae_tpu.utils.convert import load_torch_checkpoint_file
        tree, _ = load_torch_checkpoint_file(
            args.vae2d_path, prefixes=("decoder", "post_quant_conv"))
        z = latents / vae3d.config.scaling_factor
        frame2d = apply_decoder2d(tree["decoder"], z[:, None],
                                  VAE2DConfig(naming="sd21"))
        panels.append(np.asarray(frame2d.astype(jnp.float32))[0, 0])

    import cv2
    img = np.concatenate(panels, axis=1)
    img = np.clip((img + 1) * 127.5, 0, 255).astype(np.uint8)
    cv2.imwrite(args.out, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    print(f"[demo] wrote {args.out} "
          f"({'3D | 2D side-by-side' if len(panels) == 2 else '3D decode'})")


if __name__ == "__main__":
    main()
