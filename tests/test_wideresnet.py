"""Noise-conditional WideResNet classifier parity vs the reference."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE_ROOT, requires_reference

from dpm_solver_tpu.models.wideresnet import (
    WideResNetClassifier,
    get_classifier_grad_fn,
    get_logit_fn,
)

SCORE_SDE_JAX = str(REFERENCE_ROOT / "examples" / "score_sde_jax")


def _convert(ref_params, blocks_per_group):
    r = ref_params["params"]
    p = {"fourier": r["GaussianFourierProjection_0"],
         "temb_0": r["Dense_0"], "temb_1": r["Dense_1"],
         "init_conv": r["init_conv"],
         "pre_pool_bn": r["pre-pool-bn"], "logits": r["Dense_2"]}
    for g in range(3):
        grp = r[f"WideResnetGroup_{g}"]
        for i in range(blocks_per_group):
            blk = grp[f"WideResnetBlock_{i}"]
            p[f"group{g}_block{i}"] = {
                "init_bn": blk["init_bn"], "bn_2": blk["bn_2"],
                "conv1": blk["conv1"], "conv2": blk["conv2"],
                "temb_proj": blk["Dense_0"]}
    return {"params": p}


@requires_reference
def test_wideresnet_matches_reference():
    import flax

    if not hasattr(flax, "optim"):
        flax.optim = types.SimpleNamespace(Optimizer=object)  # type: ignore
    if SCORE_SDE_JAX not in sys.path:
        sys.path.insert(0, SCORE_SDE_JAX)
    from models import wideresnet_noise_conditional as ref

    rm = ref.WideResnet(blocks_per_group=2, channel_multiplier=2,
                        num_outputs=10)
    x = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3)))
    sig = jnp.asarray([0.5, 3.0])
    rp = rm.init(jax.random.PRNGKey(0), x, sig, train=False)
    want = rm.apply(rp, x, sig, train=False)

    mine = WideResNetClassifier(blocks_per_group=2, channel_multiplier=2,
                                num_outputs=10)
    params = _convert(rp, 2)
    got = mine.apply(params, x, sig)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    n1 = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(rp))
    n2 = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    assert n1 == n2


def test_classifier_grad_fn_shapes():
    model = WideResNetClassifier(blocks_per_group=1, channel_multiplier=1,
                                 num_outputs=10)
    x = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(2), (3, 16, 16, 3)))
    sig = jnp.asarray([0.5, 1.0, 2.0])
    params = model.init(jax.random.PRNGKey(3), x, sig)
    logit_fn = get_logit_fn(model, params)
    grad_fn = get_classifier_grad_fn(logit_fn)
    g = grad_fn(x, sig, jnp.asarray([0, 3, 9]))
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
