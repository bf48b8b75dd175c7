"""NCSN++/DDPM++ parity vs the reference score_sde_jax implementation.

The reference flax model (examples/score_sde_jax/models/ncsnpp.py) is used
as the numerical oracle: we init it with a fixed rng, convert its parameter
tree into our layout, and require fp32 agreement of the full forward pass
across the config matrix (resblock type x FIR x progressive modes x
embedding type). Resample ops are additionally tested standalone against
the reference's upfirdn composition, and the Pallas fused_bias_act against
the torch formula from op/fused_act.py.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE_ROOT, requires_reference

from dpm_solver_tpu.models.ncsnpp import NCSNpp, NCSNppConfig
from dpm_solver_tpu.models.ncsnpp_convert import params_from_reference
from dpm_solver_tpu.ops import resample as rs
from dpm_solver_tpu.ops.fused_act import bias_act_xla, fused_bias_act

SCORE_SDE_JAX = str(REFERENCE_ROOT / "examples" / "score_sde_jax")


@pytest.fixture(scope="session")
def ref_score_sde():
    """Import the reference score_sde_jax models package (test oracle only)."""
    import flax

    if not hasattr(flax, "optim"):  # removed in modern flax; ref only
        flax.optim = types.SimpleNamespace(Optimizer=object)  # type: ignore
    if SCORE_SDE_JAX not in sys.path:
        sys.path.insert(0, SCORE_SDE_JAX)
    import models as ref_models  # noqa: F401
    from models import ncsnpp as ref_ncsnpp
    from models import up_or_down_sampling as ref_updown

    return types.SimpleNamespace(ncsnpp=ref_ncsnpp, updown=ref_updown)


def _ref_config(cfg: NCSNppConfig):
    import ml_collections

    c = ml_collections.ConfigDict()
    c.training = ml_collections.ConfigDict({"continuous": True})
    c.data = ml_collections.ConfigDict({"centered": cfg.data_centered})
    c.model = ml_collections.ConfigDict(dict(
        name="ncsnpp", scale_by_sigma=cfg.scale_by_sigma, ema_rate=0.9999,
        normalization="GroupNorm", nonlinearity=cfg.nonlinearity, nf=cfg.nf,
        ch_mult=cfg.ch_mult, num_res_blocks=cfg.num_res_blocks,
        attn_resolutions=cfg.attn_resolutions, dropout=cfg.dropout,
        resamp_with_conv=cfg.resamp_with_conv, conditional=cfg.conditional,
        fir=cfg.fir, fir_kernel=list(cfg.fir_kernel),
        skip_rescale=cfg.skip_rescale, resblock_type=cfg.resblock_type,
        progressive=cfg.progressive, progressive_input=cfg.progressive_input,
        progressive_combine=cfg.progressive_combine, attention_type="ddpm",
        init_scale=cfg.init_scale, embedding_type=cfg.embedding_type,
        fourier_scale=cfg.fourier_scale, conv_size=3,
        sigma_max=cfg.sigma_max, sigma_min=cfg.sigma_min,
        num_scales=cfg.num_scales,
    ))
    return c


CONFIG_MATRIX = {
    "ddpmpp_vp": NCSNppConfig.tiny(),
    "ncsnpp_ve": NCSNppConfig.tiny(
        fir=True, progressive_input="residual", embedding_type="fourier",
        scale_by_sigma=True, data_centered=False),
    "output_skip": NCSNppConfig.tiny(
        fir=True, progressive="output_skip", progressive_input="input_skip",
        embedding_type="fourier"),
    "ddpm_blocks": NCSNppConfig.tiny(resblock_type="ddpm", ch_mult=(1, 2, 2)),
    # discrete-VE positional net with sigma-ladder output scaling
    # (ref configs/ve/celeba_ncsnpp.py; ncsnpp.py:79-82 sigma table indexing)
    "celeba_ve_discrete": NCSNppConfig.tiny(
        fir=True, progressive_input="residual", scale_by_sigma=True,
        data_centered=False, sigma_max=90.0),
}


@requires_reference
@pytest.mark.parametrize("name", sorted(CONFIG_MATRIX))
def test_ncsnpp_matches_reference(name, ref_score_sde):
    cfg = CONFIG_MATRIX[name]
    ref_model = ref_score_sde.ncsnpp.NCSNpp(config=_ref_config(cfg))
    model = NCSNpp(config=cfg)

    rng = jax.random.PRNGKey(7)
    b = 2
    x = jax.random.normal(
        jax.random.PRNGKey(1), (b, cfg.image_size, cfg.image_size, 3))
    if not cfg.data_centered:
        x = jax.nn.sigmoid(x)  # [0,1]-scaled inputs for VE convention
    if cfg.embedding_type == "fourier":
        t = jnp.asarray([0.5, 37.2])  # sigmas
    else:
        t = jnp.asarray([3.0, 700.0])  # discrete-ish labels

    ref_params = ref_model.init(rng, x, t, train=False)
    mine = params_from_reference(ref_params, cfg)

    want = ref_model.apply(ref_params, x, t, train=False)
    got = model.apply(mine, x, t, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=5e-5)


@requires_reference
def test_param_count_matches(ref_score_sde):
    cfg = CONFIG_MATRIX["ncsnpp_ve"]
    ref_model = ref_score_sde.ncsnpp.NCSNpp(config=_ref_config(cfg))
    x = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    t = jnp.ones((1,))
    ref_params = ref_model.init(jax.random.PRNGKey(0), x, t, train=False)
    mine = params_from_reference(ref_params, cfg)
    n_ref = sum(np.prod(l.shape) for l in jax.tree.leaves(ref_params))
    n_mine = sum(np.prod(l.shape) for l in jax.tree.leaves(mine))
    assert n_ref == n_mine


@requires_reference
def test_resample_ops_match_reference(ref_score_sde):
    ref = ref_score_sde.updown
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 13, 11, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32) * 0.1)
    k = [1.0, 3.0, 3.0, 1.0]

    cases = [
        ("upsample", ref.upsample_2d(x, k), rs.upsample_2d(x, k)),
        ("downsample", ref.downsample_2d(x, k), rs.downsample_2d(x, k)),
        ("up4", ref.upsample_2d(x, k, factor=4), rs.upsample_2d(x, k, factor=4)),
        ("nearest", ref.naive_upsample_2d(x), rs.nearest_upsample_2d(x)),
        ("upconv", ref.upsample_conv_2d(x, w, k=k, data_format="NHWC"),
         rs.upsample_conv_2d(x, w, k=k)),
        ("convdown", ref.conv_downsample_2d(x, w, k=k, data_format="NHWC"),
         rs.conv_downsample_2d(x, w, k=k)),
        ("negpad", ref._simple_upfirdn_2d(
            ref._setup_kernel(k) * 4.0, up=2, pad0=-1, pad1=3,
            data_format="NHWC", x=x) if False else ref._simple_upfirdn_2d(
            x, ref._setup_kernel(k) * 4.0, up=2, pad0=-1, pad1=3,
            data_format="NHWC"),
         rs.upfirdn2d(x, k, up=2, pad=(-1, 3), gain=4.0)),
    ]
    for label, a, b in cases:
        assert a.shape == b.shape, label
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                   atol=1e-5, err_msg=label)

    x12 = jnp.asarray(rng.randn(2, 12, 12, 5).astype(np.float32))
    np.testing.assert_allclose(np.asarray(ref.naive_downsample_2d(x12)),
                               np.asarray(rs.mean_downsample_2d(x12)),
                               rtol=0, atol=1e-6)


def test_fused_bias_act_matches_torch_formula():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    x = rng.randn(2, 9, 9, 64).astype(np.float32)
    b = rng.randn(64).astype(np.float32)
    want = (F.leaky_relu(
        torch.from_numpy(x) + torch.from_numpy(b).reshape(1, 1, 1, -1), 0.2
    ) * 2 ** 0.5).numpy()

    got = fused_bias_act(jnp.asarray(x), jnp.asarray(b), 0.2, 2 ** 0.5, True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bias_act_xla(jnp.asarray(x),
                                                       jnp.asarray(b))),
                               want, rtol=0, atol=1e-6)


def test_fused_bias_act_grads():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(3, 5, 5, 32).astype(np.float32))
    b = jnp.asarray(rng.randn(32).astype(np.float32))

    f = lambda x_, b_: (fused_bias_act(x_, b_, 0.2, 2 ** 0.5, True) ** 2).sum()
    g = lambda x_, b_: (bias_act_xla(x_, b_) ** 2).sum()
    dx1, db1 = jax.grad(f, argnums=(0, 1))(x, b)
    dx2, db2 = jax.grad(g, argnums=(0, 1))(x, b)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(db1), np.asarray(db2), rtol=1e-4,
                               atol=1e-4)


def test_load_score_sde_checkpoint_roundtrip(tmp_path):
    """Flax State msgpack -> params_ema extraction (run_lib samples from the
    EMA params, run_lib.py:389-398), with the optimizer-target fallback."""
    import numpy as np
    from flax import serialization

    from dpm_solver_tpu.models.ncsnpp_convert import load_score_sde_checkpoint

    tree = {"params": {"Conv_0": {"kernel": np.arange(12.0).reshape(3, 4),
                                  "bias": np.zeros(4)}}}
    state = {"step": np.int32(7), "lr": np.float32(2e-4),
             "optimizer": {"target": {"params": {"Conv_0": {
                 "kernel": np.ones((3, 4)), "bias": np.ones(4)}}}},
             "params_ema": tree}
    p = str(tmp_path / "checkpoint_8")
    with open(p, "wb") as f:
        f.write(serialization.msgpack_serialize(state))
    got = load_score_sde_checkpoint(p)
    np.testing.assert_array_equal(got["params"]["Conv_0"]["kernel"],
                                  tree["params"]["Conv_0"]["kernel"])

    # fallback: no params_ema -> optimizer target
    del state["params_ema"]
    with open(p, "wb") as f:
        f.write(serialization.msgpack_serialize(state))
    got = load_score_sde_checkpoint(p)
    np.testing.assert_array_equal(got["Conv_0"]["bias"], np.ones(4))


def test_bf16_compute_dtype_close_to_fp32():
    """compute_dtype=bf16 serves the same params with bf16 convs/matmuls
    (fp32 GroupNorm stats + fp32 output for the solver) and stays close to
    the fp32 forward."""
    cfg = NCSNppConfig.tiny(fir=True, progressive_input="residual",
                            embedding_type="fourier", scale_by_sigma=True,
                            data_centered=False)
    model32 = NCSNpp(config=cfg)
    model16 = NCSNpp(config=cfg, compute_dtype=jnp.bfloat16)
    x = jax.nn.sigmoid(jax.random.normal(
        jax.random.PRNGKey(0), (2, cfg.image_size, cfg.image_size, 3)))
    t = jnp.asarray([0.5, 12.0])
    params = model32.init(jax.random.PRNGKey(1), x, t, deterministic=True)
    a = model32.apply(params, x, t, deterministic=True)
    b = model16.apply(params, x, t, deterministic=True)
    assert b.dtype == jnp.float32  # solver-facing output stays fp32
    denom = np.abs(np.asarray(a)).mean() + 1e-6
    rel = np.abs(np.asarray(a) - np.asarray(b)).mean() / denom
    assert rel < 0.05, rel


def test_remat_matches_plain_outputs_and_grads():
    """config.remat=True (per-resblock jax.checkpoint) changes memory
    behavior only: outputs and parameter gradients are identical to the
    plain forward."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dpm_solver_tpu.models import NCSNpp, NCSNppConfig

    cfg = NCSNppConfig.tiny()
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (2, cfg.image_size, cfg.image_size, 3))
    t = jnp.asarray([0.3, 0.8])
    plain = NCSNpp(config=cfg)
    remat = NCSNpp(config=dataclasses.replace(cfg, remat=True))
    params = plain.init(jax.random.PRNGKey(1), x, t, deterministic=True)

    a = plain.apply(params, x, t, deterministic=True)
    b = remat.apply(params, x, t, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(m):
        return lambda p: jnp.sum(
            m.apply(p, x, t, deterministic=True) ** 2)

    ga = jax.grad(loss(plain))(params)
    gb = jax.grad(loss(remat))(params)
    for pa, pb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   atol=1e-5, rtol=1e-5)

    # dropout (non-deterministic) path also runs under remat
    c = remat.apply(params, x, t, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(c)).all()
