"""Class-conditional latent-diffusion demo (ImageNet cin256 style).

Script twin of the reference notebook
(examples/stable-diffusion/scripts/latent_imagenet_diffusion.ipynb): embed a
handful of class labels, sample the conditional LDM with classifier-free
guidance via DPM-Solver++, decode with the first stage, save a grid.

With no --ckpt a tiny random-weight bundle runs the full flow; pass a
CompVis cin256 checkpoint (+ its embed dim / class count) for real samples.

Run: python examples/latent_imagenet_demo.py --classes 25,187,448,992 [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None, help="CompVis LDM checkpoint")
    p.add_argument("--classes", default="25,187,448,992")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--scale", type=float, default=3.0)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--embed-dim", type=int, default=512)
    p.add_argument("--outdir", default="./demo_out")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dpm_solver_tpu.models import ADMConfig, ADMUNet, ClassEmbedder
    from dpm_solver_tpu.models.vae import AutoencoderKL, VAEConfig
    from dpm_solver_tpu.pipelines import (
        LatentDiffusion,
        class_conditional_sample,
        load_sd_checkpoint,
    )
    from dpm_solver_tpu.utils.logging import image_grid

    labels = np.asarray([int(c) for c in args.classes.split(",")])
    if args.ckpt:
        # cin256 preset: VQ-f4 first stage + 192-ch crossattn UNet + the
        # 0.0015..0.0195 schedule (configs/latent-diffusion/cin256-v2.yaml)
        ldm = load_sd_checkpoint(args.ckpt, preset="cin256")
        embed_dim = args.embed_dim
    else:
        print("no --ckpt: tiny random-weight bundle (structure demo only)")
        embed_dim = 16
        ucfg = ADMConfig(image_size=8, in_channels=4, model_channels=32,
                         out_channels=4, num_res_blocks=1,
                         attention_resolutions=(1, 2), channel_mult=(1, 2),
                         num_heads=2, use_spatial_transformer=True,
                         transformer_depth=1, context_dim=embed_dim)
        vcfg = VAEConfig.tiny(resolution=32, attn_resolutions=())
        unet, vae = ADMUNet(config=ucfg), AutoencoderKL(config=vcfg)
        k = jax.random.PRNGKey(0)
        up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.ones((1,)), None,
                       jnp.zeros((1, 1, embed_dim)), deterministic=True)
        vp = vae.init(k, jnp.zeros((1, 32, 32, 3)))
        ldm = LatentDiffusion(unet=unet, unet_params=up, vae=vae,
                              vae_params=vp)

    # the cin256 convention: class id n_classes = the unconditional token
    embedder = ClassEmbedder(args.num_classes + 1, embed_dim)
    imgs = class_conditional_sample(
        ldm, embedder, labels, steps=args.steps,
        guidance_scale=args.scale, uncond_label=args.num_classes,
        rng=jax.random.PRNGKey(7))

    os.makedirs(args.outdir, exist_ok=True)
    grid = image_grid(np.asarray(imgs))
    path = os.path.join(args.outdir, "demo_clscond.png")
    try:
        from PIL import Image

        Image.fromarray((grid * 255).astype(np.uint8)).save(path)
        print(f"wrote {path} (classes {labels.tolist()})")
    except ImportError:
        np.save(path + ".npy", grid)


if __name__ == "__main__":
    main()
