"""The score_sde experiment-config matrix and the VE (PC) CLI sampling path.

The reference ships one config file per experiment under
score_sde_jax/configs/{vp,subvp,ve}/** (SURVEY.md §2.3); our registry mirrors
it entry-for-entry. Field values are asserted against the reference files
(default_{cifar10,celeba,lsun}_configs.py + per-file overrides).
"""

import os

import numpy as np
import pytest

from dpm_solver_tpu.configs import get_config, list_configs
from dpm_solver_tpu.run_lib import _make_sde, build_model

EXPECTED = [
    # configs/vp/cifar10_*.py
    "score_sde_cifar10_vp_ddpmpp",
    "score_sde_cifar10_vp_ddpmpp_continuous",
    "score_sde_cifar10_vp_ddpmpp_deep_continuous",
    "score_sde_cifar10_vp_ncsnpp",
    "score_sde_cifar10_vp_ncsnpp_continuous",
    "score_sde_cifar10_vp_ncsnpp_deep_continuous",
    # configs/vp/ddpm/cifar10*.py
    "score_sde_cifar10_vp_ddpm",
    "score_sde_cifar10_vp_ddpm_continuous",
    # configs/subvp/cifar10_*.py
    "score_sde_cifar10_subvp_ddpm_continuous",
    "score_sde_cifar10_subvp_ddpmpp_continuous",
    "score_sde_cifar10_subvp_ddpmpp_deep_continuous",
    "score_sde_cifar10_subvp_ncsnpp_continuous",
    "score_sde_cifar10_subvp_ncsnpp_deep_continuous",
    # configs/ve/cifar10_*.py
    "score_sde_cifar10_ve_ddpm",
    "score_sde_cifar10_ve_ncsnpp",
    "score_sde_cifar10_ve_ncsnpp_continuous",
    "score_sde_cifar10_ve_ncsnpp_deep_continuous",
    # configs/ve high-res
    "score_sde_celeba64_ve_ncsnpp",
    "score_sde_celebahq256_ve_ncsnpp_continuous",
    "score_sde_ffhq256_ve_ncsnpp_continuous",
    "score_sde_church_ve_ncsnpp_continuous",
    "score_sde_bedroom_ve_ncsnpp_continuous",
    "score_sde_celebahq1024_ve_ncsnpp_continuous",
    "score_sde_ffhq1024_ve_ncsnpp_continuous",
    # configs/ve/ncsnv2/*.py
    "score_sde_cifar10_ve_ncsnv2",
    "score_sde_celeba64_ve_ncsnv2",
    "score_sde_bedroom_ve_ncsnv2",
    # configs/vp/ddpm/{church,bedroom,celebahq}.py
    "score_sde_church_vp_ddpm",
    "score_sde_bedroom_vp_ddpm",
    "score_sde_celebahq_vp_ddpm",
    # configs/ve/ncsn/{cifar10,celeba}*.py (base + improved-technique
    # ablations 124/1245/5)
    "score_sde_cifar10_ve_ncsn",
    "score_sde_cifar10_ve_ncsn_124",
    "score_sde_cifar10_ve_ncsn_1245",
    "score_sde_cifar10_ve_ncsn_5",
    "score_sde_celeba64_ve_ncsn",
    "score_sde_celeba64_ve_ncsn_124",
    "score_sde_celeba64_ve_ncsn_1245",
    "score_sde_celeba64_ve_ncsn_5",
    # configs/vp/ddpm/cifar10_unconditional.py
    "score_sde_cifar10_vp_ddpm_unconditional",
]


def test_registry_count_matches_reference_file_list():
    """One registry entry per reference per-experiment config file: 39
    files under score_sde_jax/configs/{vp,subvp,ve}/** (excluding the
    default_* bases and __init__)."""
    assert len(EXPECTED) == 39
    ref = "/root/reference/examples/score_sde_jax/configs"
    if os.path.isdir(ref):
        n_files = sum(
            1 for root, _, files in os.walk(ref) for f in files
            if f.endswith(".py") and not f.startswith("default")
            and f != "__init__.py")
        assert n_files == len(EXPECTED)


def test_matrix_registered_and_instantiable():
    names = list_configs()
    for n in EXPECTED:
        assert n in names, n
        cfg = get_config(n)
        assert cfg.name == n
        _make_sde(cfg)  # SDE parameters resolve


def test_reference_field_values():
    """Spot checks against the reference config files."""
    c = get_config("score_sde_cifar10_vp_ddpmpp_deep_continuous")
    assert c.model_config.num_res_blocks == 8
    assert c.training.sde == "vpsde" and c.training.continuous
    assert not c.model_config.fir

    c = get_config("score_sde_cifar10_vp_ncsnpp_continuous")
    # vp/cifar10_ncsnpp_continuous.py: fir + residual input pyramid,
    # positional embedding, no sigma scaling, centered data
    m = c.model_config
    assert m.fir and m.progressive_input == "residual"
    assert m.embedding_type == "positional" and not m.scale_by_sigma
    assert c.data.centered

    c = get_config("score_sde_cifar10_vp_ddpmpp")
    assert not c.training.continuous  # discrete twin

    c = get_config("score_sde_cifar10_ve_ncsnpp_deep_continuous")
    m = c.model_config
    assert m.embedding_type == "fourier" and m.scale_by_sigma
    assert not c.data.centered
    assert c.training.sigma_max == 50.0
    assert c.sampling.corrector == "langevin" and c.sampling.snr == 0.16

    c = get_config("score_sde_celeba64_ve_ncsnpp")
    assert c.training.sigma_max == 90.0 and c.data.image_size == 64
    assert c.model_config.embedding_type == "positional"

    c = get_config("score_sde_celebahq256_ve_ncsnpp_continuous")
    m = c.model_config
    assert c.training.sigma_max == 348.0 and c.training.num_scales == 2000
    assert m.ch_mult == (1, 1, 2, 2, 2, 2, 2)
    assert m.progressive == "output_skip"
    assert m.progressive_input == "input_skip"
    assert c.sampling.snr == 0.075

    c = get_config("score_sde_church_ve_ncsnpp_continuous")
    assert c.training.sigma_max == 380.0

    c = get_config("score_sde_ffhq1024_ve_ncsnpp_continuous")
    m = c.model_config
    assert m.nf == 16 and m.ch_mult == (1, 2, 4, 8, 16, 32, 32, 32)
    assert c.training.sigma_max == 1348.0

    c = get_config("score_sde_cifar10_ve_ncsnv2")
    assert c.training.num_scales == 232
    assert c.model_config.num_scales == 232
    assert c.sampling.predictor == "none" and c.sampling.corrector == "ald"
    assert c.sampling.n_steps_each == 5

    c = get_config("score_sde_bedroom_ve_ncsnv2")
    assert c.training.sigma_max == 190.0 and c.training.num_scales == 1086
    assert c.data.image_size == 128

    c = get_config("score_sde_church_vp_ddpm")
    assert c.model_config.ch_mult == (1, 1, 2, 2, 4, 4)
    assert c.data.image_size == 256 and not c.training.continuous

    c = get_config("score_sde_cifar10_ve_ncsn")
    m = c.model_config
    assert m.conditional_norm and not m.scale_by_sigma
    assert m.num_scales == 10 and m.sigma_max == 1.0
    # ve/ncsn/cifar10.py: snr 0.316, 100 Langevin steps per sigma
    assert c.sampling.snr == 0.316 and c.sampling.n_steps_each == 100

    # improved-technique ablations (ve/ncsn/*_{124,1245,5}.py): _124 keeps
    # ema_rate 0 with the 232/500-scale ladder back to the dataset-default
    # sigma_max and ALD 5 steps; _1245 adds EMA .999; _5 is EMA alone on
    # the original recipe
    c = get_config("score_sde_cifar10_ve_ncsn_124")
    m = c.model_config
    assert m.conditional_norm and m.num_scales == 232 and m.sigma_max == 50.0
    assert c.training.ema_rate == 0.0
    assert c.sampling.snr == 0.176 and c.sampling.n_steps_each == 5
    c = get_config("score_sde_cifar10_ve_ncsn_1245")
    assert c.training.ema_rate == 0.999 and c.training.num_scales == 232
    c = get_config("score_sde_cifar10_ve_ncsn_5")
    assert c.training.ema_rate == 0.999
    assert c.model_config.num_scales == 10 and c.model_config.sigma_max == 1.0
    assert c.sampling.n_steps_each == 100 and c.sampling.snr == 0.316
    c = get_config("score_sde_celeba64_ve_ncsn_124")
    m = c.model_config
    assert m.num_scales == 500 and m.sigma_max == 90.0 and m.image_size == 64
    assert c.sampling.snr == 0.128 and c.training.ema_rate == 0.0
    c = get_config("score_sde_celeba64_ve_ncsn_1245")
    assert c.training.ema_rate == 0.999 and c.training.num_scales == 500
    c = get_config("score_sde_celeba64_ve_ncsn")
    assert c.model_config.num_scales == 10 and c.training.ema_rate == 0.0
    assert c.sampling.n_steps_each == 100

    # vp/ddpm/cifar10_unconditional.py: conditional=False, ancestral PC
    c = get_config("score_sde_cifar10_vp_ddpm_unconditional")
    assert not c.model_config.conditional
    assert c.sampling.predictor == "ancestral_sampling"
    assert not c.training.continuous and c.training.reduce_mean

    # discrete VE NCSN++ is POSITIONAL (ve/cifar10_ncsnpp.py), unlike the
    # continuous fourier twin
    c = get_config("score_sde_cifar10_ve_ncsnpp")
    assert c.model_config.embedding_type == "positional"
    assert c.model_config.scale_by_sigma

    # per-file ALD knobs (ve/ncsnv2/{celeba,bedroom}.py)
    assert get_config("score_sde_celeba64_ve_ncsnv2").sampling.snr == 0.128
    c = get_config("score_sde_bedroom_ve_ncsnv2")
    assert c.sampling.snr == 0.095 and c.sampling.n_steps_each == 3

    # 1024px files set snr=0.15; ffhq1024 additionally reduce_mean=True
    c = get_config("score_sde_ffhq1024_ve_ncsnpp_continuous")
    assert c.sampling.snr == 0.15 and c.training.reduce_mean
    c = get_config("score_sde_celebahq1024_ve_ncsnpp_continuous")
    assert c.sampling.snr == 0.15 and not c.training.reduce_mean

    # every vp/subvp file sets training.reduce_mean=True and samples
    # pc/euler_maruyama
    for n in ("score_sde_cifar10_vp_ddpmpp_continuous",
              "score_sde_cifar10_subvp_ncsnpp_deep_continuous",
              "score_sde_church_vp_ddpm"):
        c = get_config(n)
        assert c.training.reduce_mean
        assert c.sampling.predictor == "euler_maruyama"


def test_make_sde_uses_config_params():
    from dpm_solver_tpu.sde import VESDE, VPSDE

    sde = _make_sde(get_config("score_sde_celebahq256_ve_ncsnpp_continuous"))
    assert isinstance(sde, VESDE)
    assert sde.sigma_max == 348.0 and sde.N == 2000

    sde = _make_sde(get_config("score_sde_cifar10_vp_ddpmpp_continuous"))
    assert isinstance(sde, VPSDE)
    assert sde.beta_0 == 0.1 and sde.beta_1 == 20.0


def test_ncsnv2_family_builds_and_runs():
    import jax
    import jax.numpy as jnp

    cfg = get_config("tiny_ve_ncsnv2")
    model, init_fn = build_model(cfg)
    params = init_fn(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    out = model.apply(params, x, jnp.array([0, 5], jnp.int32))
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


def test_unconditional_ddpm_drops_time_embedding():
    """conditional=False builds a net with no temb params whose output is
    invariant to t (ref score_sde_jax/models/ddpm.py:64-71 temb=None)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dpm_solver_tpu.models import DDPMUNet, DDPMUNetConfig

    cfg = dataclasses.replace(DDPMUNetConfig.tiny(), conditional=False)
    model = DDPMUNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), x, jnp.zeros((2,)))
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    assert not any("temb" in n for n in names)
    a = model.apply(params, x, jnp.zeros((2,)))
    b = model.apply(params, x, jnp.full((2,), 500.0))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_ve_pc_sampling(tmp_path):
    """`cli sample` on a vesde config routes to the PC (annealed Langevin)
    sampler with the config's predictor/corrector, in [0,1] data space."""
    from dpm_solver_tpu.cli import main

    out = str(tmp_path / "out")
    main(["sample", "--config", "tiny_ve_ncsnv2", "--batch", "2",
          "--outdir", out])
    arr = np.load(os.path.join(out, "sample.npz"))["samples"]
    assert arr.shape == (2, 16, 16, 3)
    assert np.isfinite(arr).all() and arr.min() >= 0.0 and arr.max() <= 1.0


def test_pc_vs_dpm_routing():
    """VE and subVP checkpoints are not VP-form: they route to the PC loop
    (ref models/utils.py:178-191 get_noise_fn raises for non-VP); VP ones
    sample through DPM-Solver."""
    from dpm_solver_tpu.cli import _uses_pc_sampling

    assert _uses_pc_sampling(get_config("score_sde_cifar10_ve_ddpm"))
    assert _uses_pc_sampling(get_config("score_sde_cifar10_ve_ncsnv2"))
    assert _uses_pc_sampling(
        get_config("score_sde_cifar10_subvp_ddpmpp_continuous"))
    assert not _uses_pc_sampling(
        get_config("score_sde_cifar10_vp_ddpmpp_continuous"))
    assert not _uses_pc_sampling(get_config("cifar10_ddpm"))


def test_train_smld_ncsnpp_keeps_dropout_live(tmp_path):
    """Discrete-VE NCSN++ training runs the net non-deterministically
    (dropout rng threaded through smld_loss_fn model_rng=True)."""
    import dataclasses

    from dpm_solver_tpu.models import NCSNppConfig
    from dpm_solver_tpu.run_lib import train

    base = get_config("score_sde_cifar10_ve_ncsnpp")
    tiny = NCSNppConfig.tiny(fir=True, progressive_input="residual",
                             scale_by_sigma=True, data_centered=False,
                             dropout=0.1, num_scales=16)
    cfg = dataclasses.replace(
        base, model_config=tiny,
        data=dataclasses.replace(base.data, image_size=16),
        training=dataclasses.replace(base.training, batch_size=4,
                                     num_scales=16),
        workdir=str(tmp_path / "wd"))
    rs = np.random.RandomState(0)

    def it():
        while True:
            yield rs.rand(4, 16, 16, 3).astype(np.float32)

    state = train(cfg, it(), max_steps=2)
    assert int(state.step) == 2
    import jax

    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(state.params))


def test_train_smld_discrete_ve(tmp_path):
    """train() on a discrete VE config uses the legacy SMLD objective
    (ref losses.py:124-150) and produces a resumable checkpoint."""
    from dpm_solver_tpu.run_lib import train

    cfg = get_config("tiny_ve_ncsnv2", workdir=str(tmp_path / "wd"))
    rs = np.random.RandomState(0)

    def it():
        while True:
            yield rs.rand(8, 16, 16, 3).astype(np.float32)

    state = train(cfg, it(), max_steps=3)
    assert int(state.step) == 3
    leaves = [np.asarray(x) for x in
              __import__("jax").tree.leaves(state.params)]
    assert all(np.isfinite(a).all() for a in leaves)


def test_cli_ve_train_then_eval(tmp_path):
    """The full VE loop at the CLI surface: SMLD train -> checkpoint ->
    eval sampling rounds via the PC sampler in [0,1] space."""
    from dpm_solver_tpu.cli import main

    imgs = (np.random.RandomState(0).rand(32, 16, 16, 3) * 255
            ).astype(np.uint8)
    data = str(tmp_path / "data.npz")
    np.savez(data, images=imgs)
    wd = str(tmp_path / "wd")
    main(["train", "--config", "tiny_ve_ncsnv2", "--workdir", wd,
          "--data-path", data, "--max-steps", "3"])
    assert os.listdir(os.path.join(wd, "checkpoints"))
    main(["eval", "--config", "tiny_ve_ncsnv2", "--workdir", wd,
          "--rounds", "1", "--data-path", data])
    eval_dir = os.path.join(wd, "eval")
    samples = [f for f in os.listdir(eval_dir) if f.startswith("samples_")]
    assert samples
    arr = np.load(os.path.join(eval_dir, samples[0]))["samples"]
    assert arr.shape == (4, 16, 16, 3)
    assert np.isfinite(arr).all() and arr.min() >= 0.0 and arr.max() <= 1.0


def test_continuous_vp_sampler_uses_linear_schedule():
    """_build_sampler_from_config on a continuous score_sde config builds
    the closed-form linear schedule (ref sampling.py:562), not the discrete
    table, and feeds t*999 labels."""
    import dataclasses

    import jax

    from dpm_solver_tpu.cli import _build_sampler_from_config
    from dpm_solver_tpu.models import NCSNppConfig
    from dpm_solver_tpu.run_lib import build_model

    base = get_config("score_sde_cifar10_vp_ddpmpp_continuous")
    cfg = dataclasses.replace(
        base, model_config=NCSNppConfig.tiny(),
        data=dataclasses.replace(base.data, image_size=16))
    model, init_fn = build_model(cfg)
    params = init_fn(jax.random.PRNGKey(0))

    import types as _types

    seen = []
    orig_apply = model.apply

    def spy_apply(p, x, t, **kw):
        seen.append(t)
        return orig_apply(p, x, t, **kw)

    spy_model = _types.SimpleNamespace(apply=spy_apply)
    solver, ns = _build_sampler_from_config(cfg, params, spy_model)
    assert ns.schedule == "linear"
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    out = solver.sample(x, steps=4, t_start=1.0, t_end=1e-3, order=2,
                        skip_type="logSNR", method="multistep")
    assert np.isfinite(np.asarray(out)).all()
    # probe the wrapped model eagerly: the net's label is t*999, not raw t
    seen.clear()
    solver.model_fn_raw(x, jax.numpy.full((2,), 0.5))
    assert seen and abs(float(np.asarray(seen[0])[0]) - 0.5 * 999.0) < 1e-3


def test_ve_family_ema_rates_match_reference():
    """The VE family trains with ema_rate 0.999 (ve/*.py:38-47) — NOT the
    VP default 0.9999 — except the 1024px pair and ncsnv2/bedroom, which
    the reference sets back to 0.9999; NCSN base/_124 run without EMA."""
    for name in ("score_sde_cifar10_ve_ddpm", "score_sde_cifar10_ve_ncsnpp",
                 "score_sde_cifar10_ve_ncsnpp_continuous",
                 "score_sde_cifar10_ve_ncsnpp_deep_continuous",
                 "score_sde_celeba64_ve_ncsnpp",
                 "score_sde_celebahq256_ve_ncsnpp_continuous",
                 "score_sde_ffhq256_ve_ncsnpp_continuous",
                 "score_sde_church_ve_ncsnpp_continuous",
                 "score_sde_bedroom_ve_ncsnpp_continuous",
                 "score_sde_cifar10_ve_ncsnv2",
                 "score_sde_celeba64_ve_ncsnv2"):
        assert get_config(name).training.ema_rate == 0.999, name
    for name in ("score_sde_celebahq1024_ve_ncsnpp_continuous",
                 "score_sde_ffhq1024_ve_ncsnpp_continuous",
                 "score_sde_bedroom_ve_ncsnv2",
                 "score_sde_cifar10_vp_ddpmpp_continuous",
                 "score_sde_cifar10_subvp_ddpmpp_continuous"):
        assert get_config(name).training.ema_rate == 0.9999, name
    for name in ("score_sde_cifar10_ve_ncsn", "score_sde_cifar10_ve_ncsn_124",
                 "score_sde_celeba64_ve_ncsn_124"):
        assert get_config(name).training.ema_rate == 0.0, name
