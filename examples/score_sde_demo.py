"""Score-SDE demo: PC sampling vs DPM-Solver vs likelihood on one model.

Script twin of the reference's Score_SDE_demo notebook
(examples/score_sde_pytorch/Score_SDE_demo_PyTorch.ipynb): load a score
model, draw samples with the predictor-corrector sampler and with
DPM-Solver, and report bits/dim — all in one compiled-per-stage JAX run.

With no --ckpt this runs a tiny random-weight NCSN++ so the full flow is
demonstrable anywhere (samples are noise, but every stage executes);
pass a converted score_sde checkpoint for real samples.

Run: python examples/score_sde_demo.py [--ckpt ckpt.flax] [--outdir /tmp/demo]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None,
                   help="score_sde flax checkpoint (converted); random tiny "
                        "model if omitted")
    p.add_argument("--outdir", default="./demo_out")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (e.g. smoke runs on images "
                        "that pin a remote TPU backend)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dpm_solver_tpu import NoiseScheduleVP, build_sampler, model_wrapper
    from dpm_solver_tpu.likelihood import get_likelihood_fn
    from dpm_solver_tpu.models import NCSNpp, NCSNppConfig
    from dpm_solver_tpu.samplers import get_pc_sampler
    from dpm_solver_tpu.score import get_score_fn
    from dpm_solver_tpu.sde import VPSDE
    from dpm_solver_tpu.utils.logging import image_grid

    if args.ckpt:
        from dpm_solver_tpu.models.ncsnpp_convert import (
            load_score_sde_checkpoint,
            params_from_reference,
        )

        cfg = NCSNppConfig.cifar10_ddpmpp(deep=True)
        model = NCSNpp(config=cfg)
        params = params_from_reference(load_score_sde_checkpoint(args.ckpt),
                                       cfg)
    else:
        print("no --ckpt: tiny random-weight model (structure demo only)")
        cfg = NCSNppConfig.tiny()
        model = NCSNpp(config=cfg)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
            jnp.ones((1,)), deterministic=True)

    sde = VPSDE()
    score_fn = get_score_fn(
        sde, lambda x, t: model.apply(params, x, t, deterministic=True),
        continuous=True)
    shape = (args.batch, cfg.image_size, cfg.image_size, 3)
    rng = jax.random.PRNGKey(42)

    # --- cell: PC sampling (reverse-diffusion predictor + Langevin) ---
    pc = get_pc_sampler(sde, score_fn, predictor="reverse_diffusion",
                        corrector="langevin", snr=0.16)
    x_pc, nfe = pc(sde.prior_sampling(rng, shape), rng)
    print(f"PC sampler: {nfe} NFE")

    # --- cell: DPM-Solver sampling (10 NFE vs PC's hundreds) ---
    # continuous-VP noise labels are t*999 (ref models/utils.py:164)
    ns = NoiseScheduleVP.linear(sde.beta_0, sde.beta_1)
    model_fn = model_wrapper(
        lambda x, t: model.apply(params, x, t * 999.0, deterministic=True),
        ns, model_type="noise")
    fn = build_sampler(model_fn, ns, steps=args.steps, order=3,
                       method="singlestep", skip_type="logSNR", t_end=1e-3)
    x_dpm = jax.jit(fn)(jax.random.normal(jax.random.fold_in(rng, 1), shape))
    print(f"DPM-Solver: {args.steps} NFE")

    # --- cell: likelihood (bits/dim via Hutchinson + RK45) ---
    # data is centered [-1,1] -> inverse-scaler gradient 0.5 (see
    # get_likelihood_fn docs); without it bpd is offset by +1 bit/dim
    lf = get_likelihood_fn(sde, score_fn, inverse_scaler_grad=0.5)
    bpd = lf(jax.random.fold_in(rng, 2),
             jnp.clip((x_dpm + 1.0) / 2.0, 0.0, 1.0) * 2.0 - 1.0)[0]
    print(f"bits/dim of the DPM samples: {np.asarray(bpd).mean():.3f}")

    os.makedirs(args.outdir, exist_ok=True)
    for name, x in (("pc", x_pc), ("dpm", x_dpm)):
        grid = image_grid(np.clip((np.asarray(x) + 1.0) / 2.0, 0, 1))
        path = os.path.join(args.outdir, f"demo_{name}.png")
        try:
            from PIL import Image

            Image.fromarray((grid * 255).astype(np.uint8)).save(path)
            print(f"wrote {path}")
        except ImportError:
            np.save(path + ".npy", grid)


if __name__ == "__main__":
    main()
