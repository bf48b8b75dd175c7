"""Tensor-parallel sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dpm_solver_tpu.models.adm_unet import ADMConfig, ADMUNet
from dpm_solver_tpu.parallel.tp import (
    make_tp_fn,
    make_tp_mesh,
    tp_param_specs,
)


@pytest.fixture(scope="module")
def sd_setup():
    cfg = ADMConfig(image_size=8, in_channels=4, model_channels=32,
                    out_channels=4, num_res_blocks=1,
                    attention_resolutions=(1, 2), channel_mult=(1, 2),
                    num_heads=2, use_spatial_transformer=True,
                    transformer_depth=1, context_dim=24)
    model = ADMUNet(config=cfg)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (8, 7, 24))
    t = jnp.linspace(1.0, 999.0, 8)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                        t[:1], None, ctx[:1], deterministic=True)

    def fn(p, x):
        return model.apply(p, x, t, None, ctx, deterministic=True)

    return fn, params


def test_tp_specs_follow_megatron_pattern(sd_setup):
    _, params = sd_setup
    specs = tp_param_specs(params)
    flat = {"/".join(getattr(k, "key", str(k)) for k in path): s
            for path, s in jax.tree_util.tree_flatten_with_path(specs)[0]}
    cols = [k for k in flat if k.endswith(("to_q/kernel", "to_k/kernel",
                                           "to_v/kernel", "ff/proj/kernel"))]
    rows = [k for k in flat if k.endswith(("to_out/kernel", "ff/out/kernel"))]
    assert cols and rows
    for k in cols:
        assert flat[k][-1] == "model", (k, flat[k])
    for k in rows:
        assert flat[k][-2] == "model" and flat[k][-1] is None, (k, flat[k])
    # norms replicated
    norm_keys = [k for k in flat if "/norm" in k and k.endswith("scale")]
    assert norm_keys and all(flat[k] == P() for k in norm_keys)


def test_tp_forward_matches_replicated(sd_setup):
    fn, params = sd_setup
    mesh = make_tp_mesh(jax.devices(), data=2, model=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 4))
    want = fn(params, x)
    jitted, sharded = make_tp_fn(fn, mesh, params)
    got = jitted(sharded, jax.device_put(
        x, jax.sharding.NamedSharding(mesh, P("data"))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    # params are genuinely distributed: a qkv kernel is sharded over 'model'
    leaf = sharded["params"]["input_blocks_1_1"]["block_0"]["attn1"]["to_q"][
        "kernel"]
    assert len(leaf.sharding.device_set) == 8 or \
        leaf.sharding.spec[-1] == "model"


def test_tp_mesh_shape_validation():
    with pytest.raises(AssertionError):
        make_tp_mesh(jax.devices(), data=3, model=3)  # 9 != 8
    mesh = make_tp_mesh(jax.devices(), model=2)
    assert mesh.devices.shape == (4, 2)
