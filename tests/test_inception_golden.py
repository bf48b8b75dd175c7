"""Golden-activation pinning of the FID-InceptionV3 port.

torchvision is not installed in this image, so the twin is written directly
with `torch.nn.functional` ops (NCHW), keyed by the torchvision-style state
dict our converter consumes — the exact structure of the reference network
(examples/ddpm_and_guided-diffusion/evaluate/inception.py:16-328: torchvision
InceptionV3 with FID tweaks: count_include_pad=False average pools in the
A/C/E_1 blocks, max-pool branch in E_2, 1008-way fc). Weights are RANDOMIZED
(not flax-init defaults, which would hide BatchNorm folding bugs behind
mean=0/var=1/scale=1) and pushed through both networks; activations must
agree. A shape-preserving layout bug — transposed conv kernels, swapped BN
scale/bias, wrong padding or pooling divisor semantics — cannot pass this.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from dpm_solver_tpu.eval.inception import FIDInceptionV3  # noqa: E402


def _randomized_params(params, seed=0):
    """Perturb every parameter to random values (variances kept positive)."""
    rng = np.random.default_rng(seed)

    def rnd(path, leaf):
        name = getattr(path[-1], "key", "")
        a = np.asarray(leaf)
        if name == "bn_var":
            return jnp.asarray(rng.uniform(0.3, 1.7, a.shape), jnp.float32)
        if name == "bn_scale":
            return jnp.asarray(rng.normal(1.0, 0.2, a.shape), jnp.float32)
        if name in ("bn_mean", "bn_bias", "bias"):
            return jnp.asarray(rng.normal(0.0, 0.2, a.shape), jnp.float32)
        # conv / dense kernels: keep fan-in scaling so activations stay sane
        fan_in = int(np.prod(a.shape[:-1])) if a.ndim > 1 else 1
        return jnp.asarray(rng.normal(0.0, 1.0 / np.sqrt(fan_in), a.shape),
                           jnp.float32)

    return {"params": jax.tree_util.tree_map_with_path(rnd, params["params"])}


def _to_torch_sd(params):
    """Our param tree -> torchvision-style (NCHW) state dict of tensors."""
    sd = {}

    def emit(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        mods, unit = keys[:-1], keys[-1]
        arr = np.asarray(leaf)
        if mods and mods[0] == "fc":
            sd["fc.weight" if unit == "kernel" else "fc.bias"] = (
                arr.transpose(1, 0) if unit == "kernel" else arr)
        elif unit == "kernel":
            sd[".".join(mods[:-1]) + ".conv.weight"] = arr.transpose(3, 2, 0, 1)
        else:
            leafname = {"bn_scale": "weight", "bn_bias": "bias",
                        "bn_mean": "running_mean",
                        "bn_var": "running_var"}[unit]
            sd[".".join(mods) + f".bn.{leafname}"] = arr

    jax.tree_util.tree_map_with_path(emit, params["params"])
    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}


def _torch_fid_inception(sd, x, *, resize_input):
    """The reference network as pure torch.nn.functional ops (inference)."""

    def cbr(x, p, stride=1, padding=0):
        x = F.conv2d(x, sd[p + ".conv.weight"], stride=stride, padding=padding)
        x = F.batch_norm(x, sd[p + ".bn.running_mean"],
                         sd[p + ".bn.running_var"], sd[p + ".bn.weight"],
                         sd[p + ".bn.bias"], training=False, eps=1e-3)
        return F.relu(x)

    def avgp(x):  # FID tweak: count_include_pad=False (ref :216-233)
        return F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)

    def mixed_a(x, n):
        b1 = cbr(x, f"{n}.branch1x1")
        b5 = cbr(cbr(x, f"{n}.branch5x5_1"), f"{n}.branch5x5_2", padding=2)
        bd = cbr(cbr(cbr(x, f"{n}.branch3x3dbl_1"),
                     f"{n}.branch3x3dbl_2", padding=1),
                 f"{n}.branch3x3dbl_3", padding=1)
        bp = cbr(avgp(x), f"{n}.branch_pool")
        return torch.cat([b1, b5, bd, bp], 1)

    def mixed_b(x, n):
        b3 = cbr(x, f"{n}.branch3x3", stride=2)
        bd = cbr(cbr(cbr(x, f"{n}.branch3x3dbl_1"),
                     f"{n}.branch3x3dbl_2", padding=1),
                 f"{n}.branch3x3dbl_3", stride=2)
        return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)

    def mixed_c(x, n):
        b1 = cbr(x, f"{n}.branch1x1")
        b7 = cbr(cbr(cbr(x, f"{n}.branch7x7_1"),
                     f"{n}.branch7x7_2", padding=(0, 3)),
                 f"{n}.branch7x7_3", padding=(3, 0))
        bd = cbr(x, f"{n}.branch7x7dbl_1")
        bd = cbr(bd, f"{n}.branch7x7dbl_2", padding=(3, 0))
        bd = cbr(bd, f"{n}.branch7x7dbl_3", padding=(0, 3))
        bd = cbr(bd, f"{n}.branch7x7dbl_4", padding=(3, 0))
        bd = cbr(bd, f"{n}.branch7x7dbl_5", padding=(0, 3))
        bp = cbr(avgp(x), f"{n}.branch_pool")
        return torch.cat([b1, b7, bd, bp], 1)

    def mixed_d(x, n):
        b3 = cbr(cbr(x, f"{n}.branch3x3_1"), f"{n}.branch3x3_2", stride=2)
        b7 = cbr(x, f"{n}.branch7x7x3_1")
        b7 = cbr(b7, f"{n}.branch7x7x3_2", padding=(0, 3))
        b7 = cbr(b7, f"{n}.branch7x7x3_3", padding=(3, 0))
        b7 = cbr(b7, f"{n}.branch7x7x3_4", stride=2)
        return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)

    def mixed_e(x, n, pool):
        b1 = cbr(x, f"{n}.branch1x1")
        b3 = cbr(x, f"{n}.branch3x3_1")
        b3 = torch.cat([cbr(b3, f"{n}.branch3x3_2a", padding=(0, 1)),
                        cbr(b3, f"{n}.branch3x3_2b", padding=(1, 0))], 1)
        bd = cbr(cbr(x, f"{n}.branch3x3dbl_1"),
                 f"{n}.branch3x3dbl_2", padding=1)
        bd = torch.cat([cbr(bd, f"{n}.branch3x3dbl_3a", padding=(0, 1)),
                        cbr(bd, f"{n}.branch3x3dbl_3b", padding=(1, 0))], 1)
        # E_1 uses the FID avg pool, E_2 a max pool (ref :264-328)
        bp = (F.max_pool2d(x, 3, 1, 1) if pool == "max" else avgp(x))
        bp = cbr(bp, f"{n}.branch_pool")
        return torch.cat([b1, b3, bd, bp], 1)

    if resize_input:
        x = F.interpolate(x, size=(299, 299), mode="bilinear",
                          align_corners=False)
    x = 2.0 * x - 1.0
    x = cbr(x, "Conv2d_1a_3x3", stride=2)
    x = cbr(x, "Conv2d_2a_3x3")
    x = cbr(x, "Conv2d_2b_3x3", padding=1)
    x = F.max_pool2d(x, 3, 2)
    x = cbr(x, "Conv2d_3b_1x1")
    x = cbr(x, "Conv2d_4a_3x3")
    x = F.max_pool2d(x, 3, 2)
    x = mixed_a(x, "Mixed_5b")
    x = mixed_a(x, "Mixed_5c")
    x = mixed_a(x, "Mixed_5d")
    x = mixed_b(x, "Mixed_6a")
    x = mixed_c(x, "Mixed_6b")
    x = mixed_c(x, "Mixed_6c")
    x = mixed_c(x, "Mixed_6d")
    x = mixed_c(x, "Mixed_6e")
    x = mixed_d(x, "Mixed_7a")
    x = mixed_e(x, "Mixed_7b", "avg")
    x = mixed_e(x, "Mixed_7c", "max")
    feats = x.mean((2, 3))
    logits = feats @ sd["fc.weight"].t() + sd["fc.bias"]
    return feats, logits


@pytest.mark.parametrize("resize_input,side", [(False, 75), (True, 32)])
def test_fid_inception_matches_torch_functional_twin(resize_input, side):
    model = FIDInceptionV3(resize_input=resize_input, normalize_input=True)
    x = np.random.default_rng(3).random((2, side, side, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _randomized_params(params)

    feats, logits = model.apply(params, jnp.asarray(x))
    sd = _to_torch_sd(params)
    with torch.no_grad():
        tf_, tl_ = _torch_fid_inception(
            sd, torch.from_numpy(x.transpose(0, 3, 1, 2)),
            resize_input=resize_input)

    np.testing.assert_allclose(np.asarray(feats), tf_.numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits), tl_.numpy(),
                               rtol=2e-3, atol=2e-3)
