"""torch score_sde NCSN++ checkpoint conversion.

The torch model itself cannot be imported in this image (its op/ package
compiles CUDA at import, score_sde_pytorch/op/upfirdn2d.py:10-16), so the
oracle chain is: reference FLAX model init -> synthesize the torch
``all_modules.<i>`` state dict by replaying the torch constructor order
(ncsnpp.py:70-229) with inverse layout transforms -> run our torch
converter -> require EXACT equality with the proven flax conversion path,
and forward parity through our model against the reference flax forward.
Layout transforms (Linear transpose, OIHW->HWIO, GroupNorm weight->scale,
NIN passthrough) are exercised in both directions.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE_ROOT, requires_reference

from dpm_solver_tpu.models.ncsnpp import NCSNpp, NCSNppConfig
from dpm_solver_tpu.models.ncsnpp_convert import (
    params_from_reference,
    params_from_torch,
    reference_tree_from_torch,
)

SCORE_SDE_JAX = str(REFERENCE_ROOT / "examples" / "score_sde_jax")


@pytest.fixture(scope="session")
def ref_score_sde():
    import flax

    if not hasattr(flax, "optim"):
        flax.optim = types.SimpleNamespace(Optimizer=object)  # type: ignore
    if SCORE_SDE_JAX not in sys.path:
        sys.path.insert(0, SCORE_SDE_JAX)
    import models as ref_models  # noqa: F401
    from models import ncsnpp as ref_ncsnpp

    return types.SimpleNamespace(ncsnpp=ref_ncsnpp)


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


# ---------------------------------------------------------------------------
# flax-tree -> synthetic torch state dict (inverse transforms, torch order)
# ---------------------------------------------------------------------------


def _inv_lin(sub):
    return {"weight": np.asarray(sub["kernel"]).T,
            "bias": np.asarray(sub["bias"])}


def _inv_conv(sub):
    return {"weight": np.transpose(np.asarray(sub["kernel"]), (3, 2, 0, 1)),
            "bias": np.asarray(sub["bias"])}


def _inv_gn(sub):
    return {"weight": np.asarray(sub["scale"]),
            "bias": np.asarray(sub["bias"])}


def _inv_block(sub):
    """flax resblock/attn/resample subtree -> torch param dict (nested
    submodule names are shared between the ports)."""
    out = {}
    for name, leaf in sub.items():
        if name.startswith("GroupNorm"):
            conv = _inv_gn(leaf)
        elif name.startswith(("Conv2d",)):
            conv = {"weight": np.transpose(np.asarray(leaf["weight"]),
                                           (3, 2, 0, 1)),
                    "bias": np.asarray(leaf["bias"])}
        elif name.startswith("Conv"):
            conv = _inv_conv(leaf)
        elif name.startswith("Dense"):
            conv = _inv_lin(leaf)
        elif name.startswith("NIN"):
            conv = {"W": np.asarray(leaf["W"]), "b": np.asarray(leaf["b"])}
        else:
            raise AssertionError(f"unexpected submodule {name}")
        for k, v in conv.items():
            out[f"{name}.{k}"] = v
    return out


def synth_torch_state_dict(flax_tree, cfg: NCSNppConfig) -> dict:
    """Replay the TORCH constructor order (ncsnpp.py:70-229), pulling each
    module's params from the flax auto-numbered tree."""
    import collections

    ref = flax_tree.get("params", flax_tree)
    counters = collections.defaultdict(int)

    def take(kind, optional=False):
        name = f"{kind}_{counters[kind]}"
        counters[kind] += 1
        if name not in ref:
            assert optional, f"missing {name}"
            return None
        return ref[name]

    sd = {"sigmas": np.linspace(0.01, 50.0, 8).astype(np.float32)}
    mods = []  # list of per-module param dicts, in torch order

    biggan = cfg.resblock_type == "biggan"
    rb = "ResnetBlockBigGANpp" if biggan else "ResnetBlockDDPMpp"
    levels = len(cfg.ch_mult)
    res_at = [cfg.image_size // (2 ** i) for i in range(levels)]

    if cfg.embedding_type == "fourier":
        mods.append({"W": np.asarray(take("GaussianFourierProjection")["W"])})
    if cfg.conditional:
        mods.append(_inv_lin(take("Dense")))
        mods.append(_inv_lin(take("Dense")))
    mods.append(_inv_conv(take("Conv")))

    def resample_mod(sub):
        # flax param-less FIR resamples don't appear in the tree; the torch
        # module still exists (and holds no params)
        return _inv_block(sub) if sub is not None else {}

    for i in range(levels):
        for _ in range(cfg.num_res_blocks):
            mods.append(_inv_block(take(rb)))
            if res_at[i] in cfg.attn_resolutions:
                mods.append(_inv_block(take("AttnBlockpp")))
        if i == levels - 1:
            continue
        if biggan:
            mods.append(_inv_block(take(rb)))
        else:
            mods.append(resample_mod(take("Downsample", optional=True)))
        if cfg.progressive_input == "input_skip":
            take("Downsample", optional=True)  # flax phantom; torch attr
            comb = take("Combine")
            mods.append({f"Conv_0.{k}": v
                         for k, v in _inv_conv(comb["Conv_0"]).items()})
        elif cfg.progressive_input == "residual":
            mods.append(resample_mod(take("Downsample", optional=True)))

    mods.append(_inv_block(take(rb)))
    mods.append(_inv_block(take("AttnBlockpp")))
    mods.append(_inv_block(take(rb)))

    for i in reversed(range(levels)):
        for _ in range(cfg.num_res_blocks + 1):
            mods.append(_inv_block(take(rb)))
        if res_at[i] in cfg.attn_resolutions:
            mods.append(_inv_block(take("AttnBlockpp")))
        if cfg.progressive != "none":
            if i == levels - 1:
                mods.append(_inv_gn(take("GroupNorm")))
                mods.append(_inv_conv(take("Conv")))
            elif cfg.progressive == "output_skip":
                take("Upsample", optional=True)  # flax phantom; torch attr
                mods.append(_inv_gn(take("GroupNorm")))
                mods.append(_inv_conv(take("Conv")))
            elif cfg.progressive == "residual":
                mods.append(resample_mod(take("Upsample", optional=True)))
        if i != 0:
            if biggan:
                mods.append(_inv_block(take(rb)))
            else:
                mods.append(resample_mod(take("Upsample", optional=True)))

    if cfg.progressive != "output_skip":
        mods.append(_inv_gn(take("GroupNorm")))
        mods.append(_inv_conv(take("Conv")))

    for i, m in enumerate(mods):
        for k, v in m.items():
            sd[f"all_modules.{i}.{k}"] = v
    return sd


CONFIG_MATRIX = {
    "ddpmpp_vp": NCSNppConfig.tiny(),
    "ncsnpp_ve": NCSNppConfig.tiny(
        fir=True, progressive_input="residual", embedding_type="fourier",
        scale_by_sigma=True, data_centered=False),
    "output_skip": NCSNppConfig.tiny(
        fir=True, progressive="output_skip", progressive_input="input_skip",
        embedding_type="fourier"),
    "ddpm_blocks": NCSNppConfig.tiny(resblock_type="ddpm", ch_mult=(1, 2, 2)),
}


def _tree_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: {sorted(a)} vs {sorted(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=f"{path}/{k}")


@requires_reference
@pytest.mark.parametrize("name", sorted(CONFIG_MATRIX))
def test_torch_conversion_matches_flax_path(name, ref_score_sde):
    cfg = CONFIG_MATRIX[name]
    ref_model = ref_score_sde.ncsnpp.NCSNpp(config=_ref_config(cfg))
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2, cfg.image_size, cfg.image_size, 3))
    if not cfg.data_centered:
        x = jax.nn.sigmoid(x)
    t = (jnp.asarray([0.5, 37.2]) if cfg.embedding_type == "fourier"
         else jnp.asarray([3.0, 700.0]))
    flax_tree = ref_model.init(jax.random.PRNGKey(7), x, t, train=False)

    torch_sd = synth_torch_state_dict(flax_tree, cfg)
    # the "module." DataParallel prefix must be tolerated
    torch_sd = {f"module.{k}": v for k, v in torch_sd.items()}

    via_torch = params_from_torch(torch_sd, cfg)
    via_flax = params_from_reference(flax_tree, cfg)
    _tree_equal(via_torch, via_flax)

    # and the converted params drive our model to the reference's output
    want = ref_model.apply(flax_tree, x, t, train=False)
    got = NCSNpp(config=cfg).apply(via_torch, x, t, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=5e-5)


@requires_reference
def test_torch_walk_detects_config_mismatch(ref_score_sde):
    cfg = CONFIG_MATRIX["ddpmpp_vp"]
    ref_model = ref_score_sde.ncsnpp.NCSNpp(config=_ref_config(cfg))
    x = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    flax_tree = ref_model.init(jax.random.PRNGKey(0), x, jnp.ones((1,)),
                               train=False)
    sd = synth_torch_state_dict(flax_tree, cfg)
    wrong = NCSNppConfig.tiny(ch_mult=(1, 2, 2, 2))
    with pytest.raises((ValueError, KeyError)):
        reference_tree_from_torch(sd, wrong)


def test_ema_shadow_pairing(tmp_path, ref_score_sde):
    """load_score_sde_torch_checkpoint substitutes shadow_params in
    parameters() order, excluding the sigmas buffer (and fourier W)."""
    import torch

    from dpm_solver_tpu.models.ncsnpp_convert import (
        load_score_sde_torch_checkpoint,
    )

    cfg = NCSNppConfig.tiny()
    # synthesize a torch checkpoint around a real-shaped state dict
    pytest.importorskip("flax")
    import flax  # noqa: F401

    # reuse the flax reference only if mounted; otherwise build shapes via
    # our own model and the inverse walk is untestable -> skip
    if not (REFERENCE_ROOT / "examples" / "score_sde_jax").exists():
        pytest.skip("reference not available")
    # the ref_score_sde fixture applies the flax.optim shim the old
    # reference needs; a bare `import models` here was order-dependent
    # (failed when this test ran first in its worker)
    ref_ncsnpp = ref_score_sde.ncsnpp

    ref_model = ref_ncsnpp.NCSNpp(config=_ref_config(cfg))
    x = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    flax_tree = ref_model.init(jax.random.PRNGKey(0), x, jnp.ones((1,)),
                               train=False)
    sd = synth_torch_state_dict(flax_tree, cfg)

    names = [k for k in sd if k != "sigmas"]
    shadow = [torch.from_numpy(np.asarray(sd[k]) + 1.0) for k in names]
    ckpt = {
        "model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        "ema": {"shadow_params": shadow, "decay": 0.999},
        "step": 123,
    }
    p = tmp_path / "checkpoint_8.pth"
    torch.save(ckpt, p)

    ours_ema = load_score_sde_torch_checkpoint(str(p), cfg, use_ema=True)
    ours_raw = load_score_sde_torch_checkpoint(str(p), cfg, use_ema=False)
    # every converted leaf differs by exactly +1 between raw and EMA
    for le, lr in zip(jax.tree.leaves(ours_ema), jax.tree.leaves(ours_raw)):
        np.testing.assert_allclose(np.asarray(le), np.asarray(lr) + 1.0,
                                   atol=1e-6)
