"""DiffEdit demo: mask-free prompt-to-prompt image editing.

Script twin of the reference notebook
(examples/stable-diffusion/scripts/diffedit_inpaint.ipynb): estimate the
edit mask from the noise-prediction disagreement between the source and
target prompts (cell 4), encode the image (stochastic or deterministic ODE
inversion), then resample with the masked `correcting_xt_fn` blend
(cells 5-13).

With no --ckpt a tiny random-weight SD-shaped bundle runs the full flow on
a synthetic image; pass an SD checkpoint + CLIP dir for real edits.

Run: python examples/diffedit_demo.py --src "a bowl of apples" \
         --dst "a bowl of oranges" [--init-img img.png] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None)
    p.add_argument("--clip", default=None, help="local CLIP dir")
    p.add_argument("--init-img", default=None, help="png/jpg to edit")
    p.add_argument("--src", default="a photograph")
    p.add_argument("--dst", default="an oil painting")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--encode", choices=("stochastic", "deterministic"),
                   default="stochastic")
    p.add_argument("--outdir", default="./demo_out")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dpm_solver_tpu.pipelines import diffedit, load_sd_checkpoint
    from dpm_solver_tpu.models.text_encoder import (
        FrozenCLIPEmbedder,
        constant_context_encoder,
    )

    if args.ckpt:
        text = FrozenCLIPEmbedder(args.clip) if args.clip else None
        ldm = load_sd_checkpoint(args.ckpt, text_encode=text)
    else:
        print("no --ckpt: tiny random-weight bundle (structure demo only)")
        from dpm_solver_tpu.models import ADMConfig, ADMUNet
        from dpm_solver_tpu.models.vae import AutoencoderKL, VAEConfig
        from dpm_solver_tpu.pipelines import LatentDiffusion

        ctx_dim = 16
        ucfg = ADMConfig(image_size=8, in_channels=4, model_channels=32,
                         out_channels=4, num_res_blocks=1,
                         attention_resolutions=(1, 2), channel_mult=(1, 2),
                         num_heads=2, use_spatial_transformer=True,
                         transformer_depth=1, context_dim=ctx_dim)
        vcfg = VAEConfig.tiny(resolution=32, attn_resolutions=())
        unet, vae = ADMUNet(config=ucfg), AutoencoderKL(config=vcfg)
        k = jax.random.PRNGKey(0)
        up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.ones((1,)), None,
                       jnp.zeros((1, 7, ctx_dim)), deterministic=True)
        vp = vae.init(k, jnp.zeros((1, 32, 32, 3)))
        ldm = LatentDiffusion(unet=unet, unet_params=up, vae=vae,
                              vae_params=vp,
                              text_encode=constant_context_encoder(ctx_dim))

    if args.init_img:
        from PIL import Image

        arr = np.asarray(Image.open(args.init_img).convert("RGB"),
                         np.float32) / 255.0
        init = jnp.asarray(arr[None] * 2.0 - 1.0)
    else:
        # synthetic image matching the first-stage resolution
        r = ldm.vae.config.resolution
        yy, xx = np.mgrid[0:r, 0:r].astype(np.float32) / r
        init = jnp.asarray(np.stack(
            [np.sin(7 * yy), np.cos(5 * xx), yy * xx], -1)[None] * 0.8)

    edited, mask = diffedit(ldm, init, args.src, args.dst, steps=args.steps,
                            encode_type=args.encode,
                            rng=jax.random.PRNGKey(3), return_mask=True)

    os.makedirs(args.outdir, exist_ok=True)
    pairs = {
        "original": np.clip((np.asarray(init) + 1.0) / 2.0, 0, 1)[0],
        "edited": np.clip(np.asarray(edited), 0, 1)[0],
    }
    try:
        from PIL import Image

        for name, im in pairs.items():
            path = os.path.join(args.outdir, f"diffedit_{name}.png")
            Image.fromarray((im * 255).astype(np.uint8)).save(path)
            print(f"wrote {path}")
        mask_img = (np.asarray(mask, np.float32) * 255).astype(np.uint8)
        Image.fromarray(mask_img).save(
            os.path.join(args.outdir, "diffedit_mask.png"))
        print(f"mask covers {float(np.asarray(mask).mean()):.1%} of latents")
    except ImportError:
        np.savez(os.path.join(args.outdir, "diffedit.npz"), **pairs)


if __name__ == "__main__":
    main()
