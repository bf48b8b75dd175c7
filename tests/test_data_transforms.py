"""Golden pixel tests for the dataset-specific preprocessing twins.

FID comparability to published numbers depends on exact crop/resize
semantics (VERDICT r1 #8); these tests pin each twin:

  * ddpm-example CelebA (datasets/__init__.py:60-92): fixed 128x128 window
    rows [57,185) x cols [25,153) on the 178-wide aligned images, then
    torchvision Resize == PIL bilinear (antialiased) — oracle: PIL crop+
    resize, matched within quantization-level tolerance; crop pinned exact.
  * score_sde CelebA (score_sde_jax/datasets.py:126-129): central_crop(140)
    FIRST, then resize_small — crop window pinned exactly via a pattern
    image and an identity resize.
  * score_sde LSUN (datasets.py:136-149): order flips with resolution —
    128px shrinks-then-crops, others crop-then-BICUBIC-resize with a uint8
    round-trip as part of the semantics.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from dpm_solver_tpu.data import (  # noqa: E402
    CELEBA_DDPM_WINDOW,
    celeba_ddpm_transform,
    celeba_scoresde_transform,
    crop_resize_tf,
    image_folder_dataset,
    lsun_scoresde_transform,
)


def _celeba_like(seed=0):
    """178x218 uint8 image (CelebA aligned geometry: W=178, H=218)."""
    return np.random.default_rng(seed).integers(
        0, 256, (218, 178, 3), dtype=np.uint8)


def test_celeba_ddpm_crop_window_exact():
    img = _celeba_like()
    out = np.asarray(celeba_ddpm_transform(tf.constant(img), 128))
    r0, r1, c0, c1 = CELEBA_DDPM_WINDOW
    # resolution == crop side -> resize is identity; crop must be exact
    np.testing.assert_allclose(out, img[r0:r1, c0:c1] / 255.0, atol=1e-6)


def test_celeba_ddpm_resize_matches_pil_bilinear():
    from PIL import Image

    img = _celeba_like(1)
    out = np.asarray(celeba_ddpm_transform(tf.constant(img), 64))
    r0, r1, c0, c1 = CELEBA_DDPM_WINDOW
    # torchvision Resize(PIL) == PIL.resize(BILINEAR) (antialiased)
    pil = Image.fromarray(img[r0:r1, c0:c1]).resize((64, 64), Image.BILINEAR)
    ref = np.asarray(pil, np.float32) / 255.0
    # PIL and TF antialiased bilinear agree to within quantization noise
    assert np.abs(out - ref).mean() < 2.5 / 255.0
    assert np.abs(out - ref).max() < 20.0 / 255.0


def test_celeba_scoresde_central_crop_140_exact():
    img = _celeba_like(2)
    # 218x178 -> central 140x140 window: rows [39,179), cols [19,159)
    out = np.asarray(celeba_scoresde_transform(tf.constant(img), 140))
    np.testing.assert_allclose(out, img[39:179, 19:159] / 255.0, atol=1e-5)


def test_celeba_scoresde_resize_small_aspect():
    img = _celeba_like(3)
    out = np.asarray(celeba_scoresde_transform(tf.constant(img), 64))
    assert out.shape == (64, 64, 3)  # 140x140 crop -> square shrink
    # and must equal antialiased bilinear shrink of exactly the 140 crop
    crop = img[39:179, 19:159].astype(np.float32) / 255.0
    coarse = np.asarray(tf.image.resize(crop, (64, 64), antialias=True))
    np.testing.assert_allclose(out, coarse, atol=1e-5)


def test_lsun_crop_resize_uint8_roundtrip_and_window():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (200, 320, 3), dtype=np.uint8)
    # non-square: center square crop is cols [60, 260)
    out = crop_resize_tf(tf.constant(img), 200)
    assert out.dtype == tf.uint8  # uint8 cast is part of the semantics
    np.testing.assert_array_equal(np.asarray(out), img[:, 60:260])

    out2 = np.asarray(lsun_scoresde_transform(tf.constant(img), 96))
    ref = tf.image.resize(img[:, 60:260], (96, 96), method="bicubic",
                          antialias=True)
    ref = np.asarray(tf.cast(ref, tf.uint8), np.float32) / 255.0
    np.testing.assert_allclose(out2, ref, atol=1e-6)


def test_lsun_128_shrinks_then_crops():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (256, 512, 3), dtype=np.uint8)
    out = np.asarray(lsun_scoresde_transform(tf.constant(img), 128))
    assert out.shape == (128, 128, 3)
    # shrink to 128x256 (short side 128), then central crop cols [64, 192)
    small = tf.image.resize(
        tf.image.convert_image_dtype(tf.constant(img), tf.float32),
        (128, 256), antialias=True)
    np.testing.assert_allclose(out, np.asarray(small)[:, 64:192], atol=1e-6)


def test_image_folder_dataset_transform_routing(tmp_path):
    from PIL import Image

    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        Image.fromarray(_celeba_like(10 + i)).save(d / f"{i}.png")
    ds = image_folder_dataset(str(d), resolution=64, batch_size=3,
                              random_flip=False, shuffle=False,
                              repeat=False, transform="celeba_ddpm")
    batch = next(iter(ds)).numpy()
    assert batch.shape == (3, 64, 64, 3)
    ref = np.asarray(celeba_ddpm_transform(tf.constant(_celeba_like(10)), 64))
    np.testing.assert_allclose(batch[0], ref, atol=1e-6)
    with pytest.raises(ValueError):
        image_folder_dataset(str(d), resolution=64, batch_size=1,
                             transform="nope")
