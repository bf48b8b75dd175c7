"""Sample-quality metrics: FID, Inception Score, KID.

Protocol twin of the reference evaluation stacks:
  * torch pipeline: examples/ddpm_and_guided-diffusion/evaluate/fid_score.py
    (calculate_frechet_distance :149-204, activation statistics :206-262,
    stats-npz handling :225-262),
  * jax/TF pipeline: examples/score_sde_jax/run_lib.py:507-563 +
    evaluation.py (tfgan IS/FID/KID over pooled Inception features).

Feature extraction is decoupled: every metric takes feature / logit arrays
from ANY extractor (`eval/inception.py` provides the classic FID InceptionV3
as a Flax model). Statistics run on host in float64 — FID's matrix sqrt is
numerically touchy and tiny next to feature extraction; `frechet_distance_jax`
is the on-device alternative (eigendecomposition instead of scipy.sqrtm)
for mesh-parallel eval loops that want to avoid the host round-trip.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def compute_statistics(features) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mu, sigma) in float64
    (ref fid_score.py:225-242)."""
    f = np.asarray(features, dtype=np.float64)
    assert f.ndim == 2, f.shape
    mu = f.mean(axis=0)
    sigma = np.cov(f, rowvar=False)
    return mu, sigma


def load_statistics(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read a reference-format stats npz (keys 'mu'/'sigma', e.g.
    fid_stats_cifar10_train_pytorch.npz; ref fid_score.py:243-248)."""
    with np.load(path) as d:
        return d["mu"].astype(np.float64), d["sigma"].astype(np.float64)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Fréchet distance between two Gaussians; exact reference semantics
    (fid_score.py:149-204) including the eps-jitter retry and the
    imaginary-component tolerance check."""
    from scipy import linalg

    mu1 = np.atleast_1d(np.asarray(mu1, dtype=np.float64))
    mu2 = np.atleast_1d(np.asarray(mu2, dtype=np.float64))
    sigma1 = np.atleast_2d(np.asarray(sigma1, dtype=np.float64))
    sigma2 = np.atleast_2d(np.asarray(sigma2, dtype=np.float64))
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def frechet_distance_jax(mu1, sigma1, mu2, sigma2, eps: float = 1e-6):
    """On-device Fréchet distance. tr sqrt(S1 S2) is computed from the
    eigenvalues of the similar symmetric product sqrt(S1) S2 sqrt(S1)
    (same spectrum as S1 S2, but symmetric -> stable eigh on TPU)."""
    mu1, mu2 = jnp.asarray(mu1), jnp.asarray(mu2)
    s1, s2 = jnp.asarray(sigma1), jnp.asarray(sigma2)
    d = s1.shape[0]
    jitter = eps * jnp.eye(d, dtype=s1.dtype)
    w1, v1 = jnp.linalg.eigh(s1 + jitter)
    sqrt_s1 = (v1 * jnp.sqrt(jnp.maximum(w1, 0.0))) @ v1.T
    inner = sqrt_s1 @ (s2 + jitter) @ sqrt_s1
    w = jnp.linalg.eigvalsh((inner + inner.T) / 2.0)
    tr_sqrt = jnp.sum(jnp.sqrt(jnp.maximum(w, 0.0)))
    diff = mu1 - mu2
    return diff @ diff + jnp.trace(s1) + jnp.trace(s2) - 2.0 * tr_sqrt


def fid_from_features(features, ref_stats: Union[str, Tuple[np.ndarray, np.ndarray]]) -> float:
    """Features of generated samples vs a reference stats npz / (mu, sigma)."""
    mu1, sigma1 = compute_statistics(features)
    if isinstance(ref_stats, str):
        mu2, sigma2 = load_statistics(ref_stats)
    else:
        mu2, sigma2 = ref_stats
    return frechet_distance(mu1, sigma1, mu2, sigma2)


def inception_score(logits, splits: int = 10) -> Tuple[float, float]:
    """IS from classifier logits (tfgan convention used by
    score_sde run_lib.py:529-538): exp(E_x KL(p(y|x) || p(y))) per split;
    returns (mean, std) over splits."""
    logits = np.asarray(logits, dtype=np.float64)
    probs = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs /= probs.sum(axis=1, keepdims=True)
    scores = []
    n = probs.shape[0]
    for part in np.array_split(np.arange(n), splits):
        if len(part) == 0:
            continue
        p = probs[part]
        marginal = p.mean(axis=0, keepdims=True)
        kl = np.sum(p * (np.log(p + 1e-16) - np.log(marginal + 1e-16)), axis=1)
        scores.append(np.exp(kl.mean()))
    return float(np.mean(scores)), float(np.std(scores))


def kid_from_features(f_gen, f_ref, *, max_block: int = 1024,
                      seed: Optional[int] = None) -> float:
    """Kernel Inception Distance: polynomial-kernel MMD^2 with the tfgan
    kernel k(x,y) = (x.y / D + 1)^3, block-averaged like
    tfgan.eval.kernel_classifier_distance (score_sde run_lib.py:539-549)."""
    x = np.asarray(f_gen, dtype=np.float64)
    y = np.asarray(f_ref, dtype=np.float64)
    d = x.shape[1]
    if seed is not None:
        rng = np.random.RandomState(seed)
        x = x[rng.permutation(x.shape[0])]
        y = y[rng.permutation(y.shape[0])]
    n = min(x.shape[0], y.shape[0])
    n_blocks = max(1, int(np.ceil(n / max_block)))
    xs = np.array_split(x[:n], n_blocks)
    ys = np.array_split(y[:n], n_blocks)

    def kern(a, b):
        return (a @ b.T / d + 1.0) ** 3

    vals = []
    for a, b in zip(xs, ys):
        m, l = a.shape[0], b.shape[0]
        kxx = kern(a, a)
        kyy = kern(b, b)
        kxy = kern(a, b)
        term_x = (kxx.sum() - np.trace(kxx)) / (m * (m - 1))
        term_y = (kyy.sum() - np.trace(kyy)) / (l * (l - 1))
        vals.append(term_x + term_y - 2.0 * kxy.mean())
    return float(np.mean(vals))


def compute_statistics_of_path(path: str, feature_fn, *, batch_size: int = 50):
    """(mu, sigma) of a sample source (ref evaluate/fid_score.py:231-243):
    an ``.npz`` of precomputed stats (``mu``/``sigma``), an ``.npz`` of
    images, or a directory of PNG/JPEG files. ``feature_fn`` maps [0,1]
    NHWC batches -> (features, logits) (eval.inception.make_feature_fn)."""
    import os

    import jax.numpy as jnp

    if path.endswith(".npz"):
        with np.load(path) as f:
            if "mu" in f.files and "sigma" in f.files:
                return f["mu"][:], f["sigma"][:]
            key = "samples" if "samples" in f.files else f.files[0]
            arr = np.asarray(f[key], np.float32)
            if arr.dtype == np.uint8 or arr.max() > 1.5:
                arr = arr / 255.0
            batches = [arr[i:i + batch_size]
                       for i in range(0, len(arr), batch_size)]
    else:
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.lower().endswith((".png", ".jpg", ".jpeg")))
        if not files:
            raise FileNotFoundError(f"no images under {path}")
        all_png = all(f.lower().endswith(".png") for f in files)

        def gen():
            if all_png:
                # native threaded batch decode (dpm_solver_tpu.native);
                # the reference reads its 50k-file FID folders through a
                # torch DataLoader for the same reason
                # (evaluate/fid_score.py:146-170: ImagePathDataset+workers)
                from dpm_solver_tpu import native

                for i in range(0, len(files), batch_size):
                    chunk = native.read_png_batch(files[i:i + batch_size],
                                                  channels=3)
                    yield chunk.astype(np.float32) / 255.0
                return
            from PIL import Image

            buf = []
            for f in files:
                buf.append(np.asarray(Image.open(f).convert("RGB"),
                                      np.float32) / 255.0)
                if len(buf) == batch_size:
                    yield np.stack(buf)
                    buf = []
            if buf:
                yield np.stack(buf)

        batches = gen()

    feats = [np.asarray(feature_fn(jnp.asarray(b))[0]) for b in batches]
    return compute_statistics(np.concatenate(feats))


def calculate_fid_given_paths(paths, feature_fn, *, batch_size: int = 50
                              ) -> float:
    """FID between two sample sources (ref fid_score.py:246-262). Each path
    may be an image folder, an images npz, or a precomputed-stats npz."""
    m1, s1 = compute_statistics_of_path(paths[0], feature_fn,
                                        batch_size=batch_size)
    m2, s2 = compute_statistics_of_path(paths[1], feature_fn,
                                        batch_size=batch_size)
    return frechet_distance(m1, s1, m2, s2)
