"""Model-zoo parity: Flax NHWC models vs reference torch models via the
checkpoint converter (random-initialized torch weights as the fixture)."""

import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpm_solver_tpu.models import DDPMUNet, DDPMUNetConfig
from dpm_solver_tpu.utils.convert import convert_ddpm_unet

from conftest import REFERENCE_ROOT, requires_reference


def _load_ref_ddpm_module():
    import importlib.util

    path = REFERENCE_ROOT / "examples/ddpm_and_guided-diffusion/models/diffusion.py"
    if not path.exists():
        pytest.skip("reference DDPM model not available")
    spec = importlib.util.spec_from_file_location("ref_ddpm_model", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _torch_config(cfg: DDPMUNetConfig):
    m = types.SimpleNamespace(
        ch=cfg.ch, out_ch=cfg.out_ch, ch_mult=list(cfg.ch_mult),
        num_res_blocks=cfg.num_res_blocks, attn_resolutions=list(cfg.attn_resolutions),
        dropout=cfg.dropout, in_channels=cfg.in_channels,
        resamp_with_conv=cfg.resamp_with_conv, type="simple",
    )
    return types.SimpleNamespace(
        model=m,
        data=types.SimpleNamespace(image_size=cfg.resolution),
        diffusion=types.SimpleNamespace(num_diffusion_timesteps=1000),
    )


@requires_reference
def test_ddpm_unet_matches_reference_torch():
    import torch

    ref_mod = _load_ref_ddpm_module()
    cfg = DDPMUNetConfig.tiny(resolution=16)
    torch.manual_seed(0)
    tmodel = ref_mod.Model(_torch_config(cfg))
    tmodel.eval()

    params = convert_ddpm_unet({k: v.detach().numpy() for k, v in tmodel.state_dict().items()})
    jmodel = DDPMUNet(cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, cfg.resolution, cfg.resolution, 3)).astype(np.float32)
    t = np.asarray([17.0, 431.5], dtype=np.float32)  # continuous labels incl. fractional

    got = np.asarray(jmodel.apply(params, jnp.asarray(x), jnp.asarray(t)))
    with torch.no_grad():
        want = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(t)).numpy()
    want = want.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


@requires_reference
def test_ddpm_unet_converted_param_count_and_shapes():
    import torch

    ref_mod = _load_ref_ddpm_module()
    cfg = DDPMUNetConfig.tiny()
    torch.manual_seed(1)
    tmodel = ref_mod.Model(_torch_config(cfg))
    params = convert_ddpm_unet({k: v.detach().numpy() for k, v in tmodel.state_dict().items()})
    # our own init must produce the identical tree structure/shapes
    jmodel = DDPMUNet(cfg)
    ours = jmodel.init(jax.random.key(0), jnp.zeros((1, cfg.resolution, cfg.resolution, 3)),
                       jnp.zeros((1,)))
    flat_c = jax.tree_util.tree_leaves_with_path(params)
    flat_o = jax.tree_util.tree_leaves_with_path(ours)
    paths_c = {jax.tree_util.keystr(p): v.shape for p, v in flat_c}
    paths_o = {jax.tree_util.keystr(p): v.shape for p, v in flat_o}
    assert paths_c == paths_o


def test_ddpm_unet_jit_and_bf16():
    cfg = DDPMUNetConfig.tiny()
    model = DDPMUNet(cfg, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), jnp.zeros((1, cfg.resolution, cfg.resolution, 3)),
                        jnp.zeros((1,)))
    fn = jax.jit(lambda p, x, t: model.apply(p, x, t))
    y = fn(params, jnp.ones((2, cfg.resolution, cfg.resolution, 3)), jnp.asarray([3.0, 5.0]))
    assert y.shape == (2, cfg.resolution, cfg.resolution, 3)
    assert y.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(y)))
