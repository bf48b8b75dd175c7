"""ZeRO-1 optimizer-state sharding: memory layout + numerical identity.

The sharded-state step must produce bit-comparable results to the
replicated step (same pure function, different GSPMD layout), and the
Adam moments must actually live sharded over the 8-device data axis.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpm_solver_tpu import NoiseScheduleVP
from dpm_solver_tpu.models import DDPMUNet, DDPMUNetConfig
from dpm_solver_tpu.parallel import batch_sharding, make_mesh
from dpm_solver_tpu.parallel.zero import optstate_shardings, shard_train_step
from dpm_solver_tpu.training import make_train_state, make_train_step

import optax


@pytest.fixture(scope="module")
def setup():
    cfg = DDPMUNetConfig.tiny(resolution=16)
    model = DDPMUNet(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,)))
    ns = NoiseScheduleVP.discrete(betas=np.linspace(1e-4, 0.02, 100))
    tx = optax.adam(1e-3)
    state, _ = make_train_state(params, tx=tx)
    step = make_train_step(model.apply, ns, tx)
    mesh = make_mesh(jax.devices()[:8])
    x0 = jax.random.normal(jax.random.key(1), (16, 16, 16, 3))
    return state, step, mesh, x0


def test_opt_state_is_sharded(setup):
    state, step, mesh, x0 = setup
    shardings = optstate_shardings(state, mesh)
    sharded = jax.device_put(state, shardings)
    n_dev = mesh.shape["data"]
    found_sharded = 0
    for leaf in jax.tree.leaves(sharded.opt_state):
        if not hasattr(leaf, "addressable_shards"):
            continue
        total = int(np.prod(leaf.shape)) if leaf.shape else 1
        shard = leaf.addressable_shards[0].data.size
        if total >= 2 ** 12 and any(s % n_dev == 0 and s > 0
                                    for s in leaf.shape):
            assert shard == total // n_dev, (leaf.shape, shard)
            found_sharded += 1
    assert found_sharded >= 5  # the big Adam moments really are split
    # params stay replicated
    p0 = jax.tree.leaves(sharded.params)[0]
    assert p0.addressable_shards[0].data.size == int(np.prod(p0.shape))


def test_sharded_step_matches_replicated(setup):
    """Same pure step, different GSPMD layout. Exact elementwise identity
    is NOT the right claim: parameters with mathematically-degenerate
    gradients (attention k.bias — softmax is invariant to a constant key
    shift, so its true gradient is exactly zero; biases immediately
    consumed by GroupNorm) receive pure reduction-order fp noise as their
    gradient, and Adam's first step amplifies the random sign to +-lr.
    The meaningful invariants: identical losses/grad norms, matching
    updates everywhere the gradient is significant, and an identical loss
    trajectory on a second step."""
    state, step, mesh, x0 = setup
    rng = jax.random.key(2)

    jref = jax.jit(step)
    ref_state, ref_metrics = jref(state, x0, rng)
    ref_state2, ref_metrics2 = jref(ref_state, x0, rng)

    jitted, sh_state, shardings = shard_train_step(step, mesh, state,
                                                   n_extra=1)
    data = batch_sharding(mesh)
    new_state, metrics = jitted(sh_state, jax.device_put(x0, data), rng)
    new_state2, metrics2 = jitted(new_state, jax.device_put(x0, data), rng)

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(metrics["grad_norm"]),
                               float(ref_metrics["grad_norm"]), rtol=1e-5)
    np.testing.assert_allclose(float(metrics2["loss"]),
                               float(ref_metrics2["loss"]), rtol=1e-4)

    # params: mismatches are only allowed on the degenerate-gradient
    # families (biases; temb projections whose spatially-constant output
    # is mostly cancelled by the following GroupNorm). Conv/attention
    # KERNELS — the model's actual capacity — must agree tightly.
    leaves_new = jax.tree_util.tree_flatten_with_path(new_state.params)[0]
    leaves_ref = jax.tree.leaves(ref_state.params)
    degenerate = ("bias", "temb_proj", "norm")
    for (path, a), b in zip(leaves_new, leaves_ref):
        name = jax.tree_util.keystr(path)
        d = float(np.abs(np.asarray(a) - np.asarray(b)).max())
        # 5e-5 = 5% of one Adam update (lr 1e-3): loose enough for plain
        # reduction-order noise on healthy gradients, tight enough to
        # catch a real layout bug (sign flips show up as ~2e-3)
        if d > 5e-5:
            assert any(k in name for k in degenerate), (name, d)

    # and the updated state keeps the ZeRO layout (donation-friendly loop)
    big = [l for l in jax.tree.leaves(new_state2.opt_state)
           if hasattr(l, "shape") and l.shape
           and int(np.prod(l.shape)) >= 2 ** 12
           and any(s % mesh.shape["data"] == 0 and s > 0 for s in l.shape)]
    assert big and all(
        l.addressable_shards[0].data.size < int(np.prod(l.shape))
        for l in big)


def test_adversarial_state_shards_both_optimizers():
    """optstate_shardings handles the two-optimizer AdversarialTrainState
    (gen_opt + disc_opt sharded, params/batch_stats replicated)."""
    import flax
    import optax as _optax

    from dpm_solver_tpu.models.discriminator import NLayerDiscriminator
    from dpm_solver_tpu.models.vae import AutoencoderKL, VAEConfig
    from dpm_solver_tpu.training.autoencoder import make_adversarial_state

    cfg = VAEConfig.tiny(resolution=16, attn_resolutions=())
    vae = AutoencoderKL(cfg)
    ae_params = vae.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 16, 16, 3)),
                         jax.random.PRNGKey(0))["params"]
    disc = NLayerDiscriminator(ndf=8, n_layers=2)
    disc_vars = disc.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))
    state, _ = make_adversarial_state(ae_params, disc_vars)

    mesh = make_mesh(jax.devices()[:8])
    shardings = optstate_shardings(state, mesh)
    sharded = jax.device_put(state, shardings)
    n = mesh.shape["data"]
    for opt in (sharded.gen_opt, sharded.disc_opt):
        split = [l for l in jax.tree.leaves(opt)
                 if hasattr(l, "shape") and l.shape and l.size >= 2 ** 12
                 and any(s % n == 0 and s > 0 for s in l.shape)
                 and l.addressable_shards[0].data.size == l.size // n]
        assert split, "no sharded moment found"
    p0 = jax.tree.leaves(sharded.gen_params)[0]
    assert p0.addressable_shards[0].data.size == p0.size
