"""Invisible watermark + safety checker.

Watermark: the reference's put_watermark/test_watermark pair
(txt2img.py:69-74, scripts/tests/test_watermark.py) embeds/decodes a
136-bit "StableDiffusionV1" payload with invisible-watermark's dwtDct; ours
is a behavioral twin with the same payload conventions. Safety checker:
diffusers decision rule (cosine vs concept embeddings, special-care
threshold bonus) as wired at txt2img.py:88-95.
"""

import io

import numpy as np
import pytest

from dpm_solver_tpu.utils.safety import SafetyChecker
from dpm_solver_tpu.utils.watermark import (
    DEFAULT_WM,
    decode_watermark,
    decode_watermark_text,
    put_watermark,
)


def _photo(h=256, w=256, seed=0):
    """Smooth-ish synthetic photo (pure noise is the watermark's worst case
    and not what SD emits)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([
        128 + 90 * np.sin(xx / 23.0) * np.cos(yy / 31.0),
        128 + 80 * np.cos(xx / 17.0 + 1.0),
        128 + 70 * np.sin((xx + yy) / 41.0),
    ], axis=-1)
    return np.clip(base + rng.normal(0, 6, (h, w, 3)), 0, 255).astype(np.uint8)


def test_watermark_roundtrip_default_payload():
    img = _photo()
    out = put_watermark(img)  # default "StableDiffusionV1", 136 bits
    assert out.shape == img.shape and out.dtype == np.uint8
    assert decode_watermark_text(out) == DEFAULT_WM
    # imperceptibility: small mean distortion
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 6.0


def test_watermark_roundtrip_custom_payload():
    img = _photo(seed=3)
    out = put_watermark(img, "hello-tpu")
    assert decode_watermark(out, 8 * len(b"hello-tpu")) == b"hello-tpu"


def test_watermark_survives_png_cycle(tmp_path):
    from PIL import Image

    out = put_watermark(_photo(seed=5))
    bio = io.BytesIO()
    Image.fromarray(out).save(bio, format="PNG")
    bio.seek(0)
    back = np.asarray(Image.open(bio).convert("RGB"), np.uint8)
    assert decode_watermark_text(back) == DEFAULT_WM


def test_watermark_unmarked_image_decodes_garbage():
    txt = decode_watermark_text(_photo(seed=9))
    assert txt != DEFAULT_WM


def test_watermark_input_validation():
    with pytest.raises(ValueError):
        put_watermark(np.zeros((10, 10, 3), np.float32))
    with pytest.raises(ValueError):
        put_watermark(np.zeros((33, 32, 3), np.uint8))  # not % 4


# ---------------------------------------------------------------------------
# safety checker
# ---------------------------------------------------------------------------

D = 8


def _embedder_from_map(mapping):
    """Stub CLIP image embedder: image index (encoded in pixel 0) -> row."""

    def embed(images):
        idx = np.asarray(images)[:, 0, 0, 0].astype(int)
        return mapping[idx]

    return embed


def test_safety_checker_decision_rule():
    rng = np.random.default_rng(0)
    concepts = rng.standard_normal((3, D)).astype(np.float32)
    emb = np.zeros((4, D), np.float32)
    emb[0] = concepts[0]            # cos=1 vs concept 0 -> flagged
    emb[1] = -concepts[1]           # anti-aligned -> clean
    emb[2] = rng.standard_normal(D)
    emb[3] = concepts[2] * 5.0      # scale-invariant (cosine) -> flagged
    images = np.zeros((4, 2, 2, 3), np.float32)
    images[:, 0, 0, 0] = np.arange(4)

    checker = SafetyChecker(_embedder_from_map(emb), concepts,
                            concept_thresholds=[0.9, 0.9, 0.9])
    checked, flags = checker(images)
    assert flags.tolist() == [True, False,
                              bool(_cos(emb[2], concepts).max() > 0.9), True]
    # flagged samples zeroed, clean ones untouched
    assert (checked[0] == 0).all()
    np.testing.assert_array_equal(checked[1], images[1])


def _cos(v, m):
    v = v / np.linalg.norm(v)
    m = m / np.linalg.norm(m, axis=-1, keepdims=True)
    return m @ v


def test_safety_special_care_adjustment():
    """A special-care hit adds the diffusers 0.01 concept-threshold bonus:
    borderline concepts flip to flagged."""
    concept = np.array([[1.0] + [0.0] * (D - 1)], np.float32)
    special = np.array([[0.0, 1.0] + [0.0] * (D - 2)], np.float32)
    # image embedding: cos vs concept just UNDER threshold, special over
    v = np.zeros((1, D), np.float32)
    v[0, 0] = 1.0
    v[0, 1] = 0.4
    cos_c = _cos(v[0], concept)[0]
    images = np.zeros((1, 2, 2, 3), np.float32)

    base = SafetyChecker(_embedder_from_map(v), concept,
                         concept_thresholds=[cos_c + 0.005])
    assert not base.flag(images)[0]
    with_special = SafetyChecker(
        _embedder_from_map(v), concept, concept_thresholds=[cos_c + 0.005],
        special_embeds=special, special_thresholds=[0.2])
    assert with_special.flag(images)[0]


def test_safety_replacement_image():
    emb = np.ones((1, D), np.float32)
    rep = np.full((2, 2, 3), 0.5, np.float32)
    checker = SafetyChecker(_embedder_from_map(emb), np.ones((1, D)),
                            concept_thresholds=[0.5], replacement=rep)
    images = np.zeros((1, 2, 2, 3), np.float32)
    checked, flags = checker(images)
    assert flags[0]
    np.testing.assert_array_equal(checked[0], rep)


def test_watermark_capacity_guard():
    with pytest.raises(ValueError, match="too small"):
        put_watermark(_photo(h=32, w=32))  # 16 blocks < 136 bits
    # but a short payload fits
    out = put_watermark(_photo(h=32, w=32, seed=1), "ok")
    assert decode_watermark(out, 16) == b"ok"


def test_safety_special_requires_thresholds():
    with pytest.raises(ValueError, match="together"):
        SafetyChecker(lambda x: np.zeros((1, D), np.float32),
                      np.ones((1, D)), concept_thresholds=[0.5],
                      special_embeds=np.ones((1, D)))
