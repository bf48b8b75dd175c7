"""Eval-harness tests: Fréchet distance parity vs the reference fid_score,
on-device variant agreement, IS/KID sanity, and the FID InceptionV3 port."""

import importlib.util
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE_ROOT, requires_reference

from dpm_solver_tpu.eval import (
    compute_statistics,
    fid_from_features,
    frechet_distance,
    frechet_distance_jax,
    inception_score,
    kid_from_features,
)
from dpm_solver_tpu.eval.inception import (
    FIDInceptionV3,
    convert_fid_inception,
    make_feature_fn,
)

FID_SCORE = (REFERENCE_ROOT / "examples" / "ddpm_and_guided-diffusion"
             / "evaluate" / "fid_score.py")


@pytest.fixture(scope="session")
def ref_fid_score():
    # fid_score imports torchvision.transforms + evaluate.inception at module
    # scope; stub both (torchvision is not installed, and we only need the
    # pure-numpy calculate_frechet_distance)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    # it falls back to `from pytorch_fid.inception import InceptionV3`
    if "pytorch_fid" not in sys.modules:
        pf = types.ModuleType("pytorch_fid")
        inc = types.ModuleType("pytorch_fid.inception")
        inc.InceptionV3 = type("InceptionV3", (), {"BLOCK_INDEX_BY_DIM": {2048: 3}})
        pf.inception = inc
        sys.modules["pytorch_fid"] = pf
        sys.modules["pytorch_fid.inception"] = inc
    spec = importlib.util.spec_from_file_location("ref_fid_score", FID_SCORE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _two_gaussians(d=16, n=500, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randn(n, d) @ rng.randn(d, d) * 0.2 + rng.randn(d)
    b = rng.randn(n, d) @ rng.randn(d, d) * 0.2 + rng.randn(d) * 0.5
    return a, b


@requires_reference
def test_frechet_distance_matches_reference(ref_fid_score):
    a, b = _two_gaussians()
    mu1, s1 = compute_statistics(a)
    mu2, s2 = compute_statistics(b)
    want = ref_fid_score.calculate_frechet_distance(mu1, s1, mu2, s2)
    got = frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, want, rtol=1e-10)
    # and the convenience entry
    got2 = fid_from_features(a, (mu2, s2))
    np.testing.assert_allclose(got2, want, rtol=1e-10)


def test_frechet_distance_jax_agrees_with_host():
    a, b = _two_gaussians(seed=3)
    mu1, s1 = compute_statistics(a)
    mu2, s2 = compute_statistics(b)
    host = frechet_distance(mu1, s1, mu2, s2)
    dev = float(frechet_distance_jax(mu1, s1, mu2, s2))
    np.testing.assert_allclose(dev, host, rtol=1e-3, atol=1e-3)


def test_frechet_distance_identity_is_zero():
    a, _ = _two_gaussians(seed=5)
    mu, s = compute_statistics(a)
    assert abs(frechet_distance(mu, s, mu, s)) < 1e-6


def test_inception_score_bounds():
    rng = np.random.RandomState(0)
    n, k = 400, 10
    uniform = np.zeros((n, k))
    mean_u, _ = inception_score(uniform, splits=4)
    assert abs(mean_u - 1.0) < 1e-6  # uniform predictive -> IS == 1
    # confident + diverse -> IS near k
    labels = rng.randint(0, k, n)
    confident = np.full((n, k), -20.0)
    confident[np.arange(n), labels] = 20.0
    mean_c, _ = inception_score(confident, splits=4)
    assert mean_c > 0.8 * k


def test_kid_zero_for_same_distribution():
    rng = np.random.RandomState(1)
    f1 = rng.randn(800, 32)
    f2 = rng.randn(800, 32)
    near = kid_from_features(f1, f2)
    far = kid_from_features(f1 + 2.0, f2)
    assert abs(near) < 0.05
    assert far > 10 * abs(near)


def test_fid_inception_forward_and_converter():
    model = FIDInceptionV3(resize_input=False, normalize_input=True)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 75, 75, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    feats, logits = model.apply(params, x)
    assert feats.shape == (2, 2048) and logits.shape == (2, 1008)
    assert np.isfinite(np.asarray(feats)).all()
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    # FID inception: 23.8M weights (incl. 1008-way fc, excl. aux logits)
    assert 23_000_000 < n_params < 26_000_000, n_params

    # converter consistency: emit a torch-style dict from our tree, convert
    # back, and require the exact same tree
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
    back = convert_fid_inception(sd)
    jax.tree.map(np.testing.assert_array_equal, back, dict(params))

    fn = make_feature_fn(params, resize_input=False, jit=False)
    f2, l2 = fn(x)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(feats), atol=1e-6)


def test_calculate_fid_given_paths(tmp_path):
    """Folder/npz path-based FID entry (ref fid_score.py:231-262): stats
    npz short-circuits; identical folders give FID ~ 0."""
    import numpy as np
    from PIL import Image

    from dpm_solver_tpu.eval.fid import (
        calculate_fid_given_paths,
        compute_statistics,
        compute_statistics_of_path,
    )

    def feature_fn(batch):
        # stub extractor: channel means + coarse pooled pixels
        b = np.asarray(batch, np.float32)
        pooled = b.reshape(b.shape[0], 4, b.shape[1] // 4,
                           4, b.shape[2] // 4, 3).mean((2, 4))
        return pooled.reshape(b.shape[0], -1), None

    rng = np.random.default_rng(0)
    folder = tmp_path / "imgs"
    folder.mkdir()
    imgs = rng.integers(0, 256, (24, 16, 16, 3), dtype=np.uint8)
    for i, im in enumerate(imgs):
        Image.fromarray(im).save(folder / f"{i:03d}.png")

    # same distribution both ways -> FID ~ 0
    fid_same = calculate_fid_given_paths([str(folder), str(folder)],
                                         feature_fn, batch_size=7)
    assert abs(fid_same) < 1e-6

    # npz stats path short-circuits the extractor
    feats, _ = feature_fn(imgs / 255.0)
    mu, sigma = compute_statistics(feats)
    np.savez(tmp_path / "stats.npz", mu=mu, sigma=sigma)
    fid_stats = calculate_fid_given_paths(
        [str(tmp_path / "stats.npz"), str(folder)], feature_fn, batch_size=7)
    assert abs(fid_stats) < 1e-4

    # a shifted distribution is far
    np.savez(tmp_path / "other.npz",
             samples=np.clip(imgs / 255.0 + 0.3, 0, 1).astype(np.float32))
    fid_diff = calculate_fid_given_paths(
        [str(tmp_path / "other.npz"), str(folder)], feature_fn, batch_size=7)
    assert fid_diff > fid_same + 0.01

    m, s = compute_statistics_of_path(str(folder), feature_fn, batch_size=7)
    np.testing.assert_allclose(m, mu, atol=1e-5)
