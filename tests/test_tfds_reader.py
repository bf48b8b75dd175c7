"""TFDS on-disk directory reader (zero-egress tfds.builder twin).

Builds a synthetic prepared-dataset directory in the TFDS layout
(versioned dir, dataset_info.json with shardLengths + filepathTemplate,
features.json, PNG-encoded Example records across two shards) and checks
`data.tfds_dataset` reproduces the reference pipeline's surface
(score_sde_jax/datasets.py:103-199): decode, resize/transform, dequant,
centering, labels.
"""

import json
import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from dpm_solver_tpu.data import tfds_dataset  # noqa: E402


def _make_tfds_dir(tmp_path, n=12, size=32, two_shards=True):
    root = tmp_path / "toyset" / "1.0.2"
    os.makedirs(root)
    rng = np.random.default_rng(0)
    imgs = (rng.random((n, size, size, 3)) * 255).astype(np.uint8)
    labels = (np.arange(n) % 10).astype(np.int64)

    def example(img, lab):
        png = tf.io.encode_png(img).numpy()
        return tf.train.Example(features=tf.train.Features(feature={
            "image": tf.train.Feature(
                bytes_list=tf.train.BytesList(value=[png])),
            "label": tf.train.Feature(
                int64_list=tf.train.Int64List(value=[int(lab)])),
        })).SerializeToString()

    shards = 2 if two_shards else 1
    per = n // shards
    shard_lengths = []
    for s in range(shards):
        fname = root / f"toyset-train.tfrecord-{s:05d}-of-{shards:05d}"
        with tf.io.TFRecordWriter(str(fname)) as w:
            for i in range(s * per, (s + 1) * per):
                w.write(example(imgs[i], labels[i]))
        shard_lengths.append(str(per))

    (root / "dataset_info.json").write_text(json.dumps({
        "name": "toyset",
        "splits": [{"name": "train", "shardLengths": shard_lengths,
                    "filepathTemplate":
                        "{DATASET}-{SPLIT}.{FILEFORMAT}-{SHARD_X_OF_Y}"}],
    }))
    (root / "features.json").write_text(json.dumps({
        "featuresDict": {"features": {
            "image": {"pythonClassName":
                      "tensorflow_datasets.core.features.image_feature.Image"},
            "label": {"pythonClassName":
                      "tensorflow_datasets.core.features.class_label_feature."
                      "ClassLabel"},
        }}}))
    return str(tmp_path), imgs, labels


def test_reads_images_and_shapes(tmp_path):
    data_dir, imgs, _ = _make_tfds_dir(tmp_path)
    ds = tfds_dataset(data_dir, name="toyset", resolution=0, batch_size=4,
                      shuffle=False, repeat=False)
    batch = next(iter(ds)).numpy()
    assert batch.shape == (4, 32, 32, 3)
    assert batch.min() >= 0.0 and batch.max() <= 1.0
    # exact decode round-trip (PNG lossless, convert_image_dtype /255)
    np.testing.assert_allclose(batch[0], imgs[0] / 255.0, atol=1e-6)


def test_labels_dequant_centered(tmp_path):
    data_dir, _, labels = _make_tfds_dir(tmp_path)
    ds = tfds_dataset(data_dir, name="toyset", resolution=16, batch_size=6,
                      shuffle=False, repeat=False, centered=True,
                      uniform_dequantization=True, with_labels=True)
    batch = next(iter(ds))
    img = batch["image"].numpy()
    assert img.shape == (6, 16, 16, 3)
    assert img.min() >= -1.0 and img.max() <= 1.0
    np.testing.assert_array_equal(batch["label"].numpy(), labels[:6])


def test_transform_routing_and_missing(tmp_path):
    data_dir, _, _ = _make_tfds_dir(tmp_path)
    ds = tfds_dataset(data_dir, name="toyset", resolution=16, batch_size=2,
                      shuffle=False, repeat=False,
                      transform="lsun_scoresde")
    assert next(iter(ds)).numpy().shape == (2, 16, 16, 3)
    with pytest.raises(ValueError):
        tfds_dataset(data_dir, name="toyset", resolution=16, batch_size=2,
                     transform="nope")
    with pytest.raises(FileNotFoundError):
        tfds_dataset(str(tmp_path / "empty"), name=None, batch_size=2)
