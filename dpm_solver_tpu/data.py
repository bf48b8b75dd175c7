"""Input pipelines: tf.data -> sharded JAX batches.

Protocol twin of examples/score_sde_jax/datasets.py:23-206 (uniform
dequantization, random flips, [0,1] or centered scaling, the
[local_devices, n_jitted_steps, per_device_batch] layout) and the torch
example's folder datasets (ddpm_and_guided-diffusion/datasets/*).

This image is zero-egress and has no tensorflow_datasets, so the sources are
local: in-memory arrays, CIFAR-10 python pickles, image folders, or
TFRecords (the reference's FFHQ/CelebAHQ format). tf.data stays host-side;
batches surface as numpy for `jax.device_put` with a sharding.
"""

from __future__ import annotations

import os
import pickle
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np


def scaler(centered: bool):
    """[0,1] -> model space (ref datasets.py get_data_scaler)."""
    return (lambda x: x * 2.0 - 1.0) if centered else (lambda x: x)


def inverse_scaler(centered: bool):
    return (lambda x: (x + 1.0) / 2.0) if centered else (lambda x: x)


def logit_transform(x, lam: float = 1e-6):
    """[0,1] pixels -> logit space (ref ddpm_and_guided-diffusion/
    datasets/__init__.py:184-186)."""
    import jax.numpy as jnp

    x = lam + (1.0 - 2.0 * lam) * x
    return jnp.log(x) - jnp.log1p(-x)


def data_transform(data_cfg, x, *, rng=None):
    """[0,1] images -> model space per the config's data block
    (ref datasets/__init__.py:189-203: dequantization, then rescale to
    [-1,1] (`centered`) OR logit transform)."""
    import jax
    import jax.numpy as jnp

    if getattr(data_cfg, "uniform_dequantization", False) and rng is not None:
        x = (x * 255.0 + jax.random.uniform(rng, x.shape, x.dtype)) / 256.0
    if getattr(data_cfg, "gaussian_dequantization", False) and rng is not None:
        x = x + jax.random.normal(rng, x.shape, x.dtype) * 0.01
    if getattr(data_cfg, "logit_transform", False):
        return logit_transform(x)
    if data_cfg.centered:
        return 2.0 * x - 1.0
    return x


def inverse_data_transform(data_cfg, x):
    """Model space -> [0,1] images, clipped
    (ref datasets/__init__.py:206-215)."""
    import jax
    import jax.numpy as jnp

    if getattr(data_cfg, "logit_transform", False):
        x = jax.nn.sigmoid(x)
    elif data_cfg.centered:
        x = (x + 1.0) / 2.0
    return jnp.clip(x, 0.0, 1.0)


def load_cifar10_dir(path: str, *, train: bool = True) -> np.ndarray:
    """CIFAR-10 python-pickle directory (data_batch_1..5 / test_batch) ->
    uint8 NHWC array. The standard distribution format, no tfds needed."""
    names = [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
    parts = []
    for n in names:
        with open(os.path.join(path, n), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        parts.append(np.asarray(d[b"data"], np.uint8))
    flat = np.concatenate(parts)
    return flat.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)


def make_dataset(
    images: np.ndarray,
    *,
    batch_size: int,
    n_jitted_steps: int = 1,
    num_local_devices: Optional[int] = None,
    uniform_dequantization: bool = False,
    random_flip: bool = True,
    centered: bool = False,
    shuffle: bool = True,
    seed: int = 0,
    repeat: bool = True,
):
    """uint8/float NHWC array -> tf.data pipeline with the reference's batch
    layout [devices, n_jitted_steps, per_device] (ref datasets.py:86-99).

    Returns (tf_dataset, batch_shape_prefix)."""
    import jax
    import tensorflow as tf

    tf.config.experimental.set_visible_devices([], "GPU")
    nd = num_local_devices or jax.local_device_count()
    if batch_size % nd:
        raise ValueError(f"batch {batch_size} not divisible by {nd} devices")
    per_device = batch_size // nd

    ds = tf.data.Dataset.from_tensor_slices(images)
    if repeat:
        ds = ds.repeat()
    if shuffle:
        ds = ds.shuffle(min(len(images), 10_000), seed=seed)

    integer_pixels = np.issubdtype(np.asarray(images).dtype, np.integer)

    def prep(img):
        img = tf.cast(img, tf.float32)
        if integer_pixels:  # 0..255 pixel values -> [0, 1]
            img = img / 255.0
        if random_flip:
            img = tf.image.random_flip_left_right(img)
        if uniform_dequantization:
            img = (tf.random.uniform(tf.shape(img)) + img * 255.0) / 256.0
        if centered:
            img = img * 2.0 - 1.0
        return img

    ds = ds.map(prep, num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.batch(per_device, drop_remainder=True)
    if n_jitted_steps > 1:
        ds = ds.batch(n_jitted_steps, drop_remainder=True)
    ds = ds.batch(nd, drop_remainder=True)
    return ds.prefetch(tf.data.AUTOTUNE)


def numpy_iterator(ds) -> Iterator[np.ndarray]:
    for batch in ds:
        yield batch.numpy() if hasattr(batch, "numpy") else np.asarray(batch)


def tfrecord_dataset(path, *, resolution: int, batch_size: int,
                     uniform_dequantization: bool = False,
                     centered: bool = False, random_flip: bool = False,
                     shuffle: bool = True, repeat: bool = True, seed: int = 0):
    """FFHQ/CelebAHQ TFRecord pipeline: records hold a CHW uint8 tensor as
    {'shape': int64[3], 'data': bytes} (ref datasets.py:151-171). Emits
    [B, H, W, C] float batches in model space."""
    import tensorflow as tf

    tf.config.experimental.set_visible_devices([], "GPU")
    ds = tf.data.TFRecordDataset(path)
    if repeat:
        ds = ds.repeat()
    if shuffle:
        ds = ds.shuffle(10_000, seed=seed)

    def parse(record):
        sample = tf.io.parse_single_example(record, features={
            "shape": tf.io.FixedLenFeature([3], tf.int64),
            "data": tf.io.FixedLenFeature([], tf.string)})
        img = tf.reshape(tf.io.decode_raw(sample["data"], tf.uint8),
                         sample["shape"])
        img = tf.transpose(img, (1, 2, 0))  # CHW (reference layout) -> HWC
        img = tf.image.convert_image_dtype(img, tf.float32)
        if resolution:
            img = tf.image.resize(img, (resolution, resolution),
                                  antialias=True)
        if random_flip:
            img = tf.image.random_flip_left_right(img)
        if uniform_dequantization:
            img = (tf.random.uniform(tf.shape(img)) + img * 255.0) / 256.0
        if centered:
            img = img * 2.0 - 1.0
        return img

    ds = ds.map(parse, num_parallel_calls=tf.data.AUTOTUNE)
    return ds.batch(batch_size, drop_remainder=True).prefetch(tf.data.AUTOTUNE)


def prefetch_iterator(it: Iterator, depth: int = 2) -> Iterator:
    """Run `it` on a worker thread with a bounded queue — the host-side
    equivalent of tf.data's `.prefetch(depth)`, so batch prep overlaps the
    accelerator step. Exceptions propagate to the consumer."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 — re-raised consumer-side
            q.put((sentinel, e))
            return
        q.put((sentinel, None))

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if isinstance(item, tuple) and len(item) == 2 and item[0] is sentinel:
            if item[1] is not None:
                raise item[1]
            return
        yield item


def tfrecord_dataset_native(paths, *, resolution: int, batch_size: int,
                            image_key: str = "data",
                            shape_key: Optional[str] = "shape",
                            label_key: Optional[str] = None,
                            uniform_dequantization: bool = False,
                            centered: bool = False,
                            random_flip: bool = False,
                            shuffle: bool = True, repeat: bool = True,
                            seed: int = 0, prefetch: int = 2):
    """TensorFlow-free twin of `tfrecord_dataset`/`tfds_dataset` built on
    the native host-IO runtime (dpm_solver_tpu.native): mmap + CRC32C
    record indexing and a wire-format Example walker in C++, PIL for
    encoded-image payloads. Two record layouts, as in the reference:

      * raw CHW tensors: {'shape': int64[3], 'data': raw bytes} — the
        FFHQ/CelebAHQ format (ref score_sde_jax/datasets.py:151-171);
        pass shape_key='shape'.
      * encoded images: {image_key: png/jpeg bytes[, label]} — the
        prepared-TFDS format; pass shape_key=None.

    Yields [B, H, W, C] float32 batches in model space (or
    {'image', 'label'} dicts when label_key is set); infinite when repeat.
    """
    from dpm_solver_tpu import native

    if isinstance(paths, str):
        paths = [paths]
    index = []  # (path_idx, offset, length)
    for pi, p in enumerate(paths):
        offs, lens = native.tfrecord_index(p)
        index.extend((pi, int(o), int(n)) for o, n in zip(offs, lens))
    if not index:
        raise FileNotFoundError(f"no records under {paths}")
    blobs = [np.memmap(p, np.uint8, mode="r") for p in paths]
    rng = np.random.default_rng(seed)

    def decode_raw(rec: bytes) -> np.ndarray:
        shape = _example_int64_list(rec, shape_key)  # C,H,W
        img = np.frombuffer(native.example_bytes(rec, image_key),
                            np.uint8).reshape(shape)
        return np.transpose(img, (1, 2, 0))  # CHW -> HWC

    def decode_encoded_batch(payloads) -> np.ndarray:
        h, w, c, _ = native.image_probe_mem(payloads[0])
        return native.decode_image_batch(payloads, h, w, min(c, 3))

    def maybe_resize(img: np.ndarray) -> np.ndarray:
        if resolution and img.shape[:2] != (resolution, resolution):
            from PIL import Image

            img = np.asarray(Image.fromarray(img).resize(
                (resolution, resolution), Image.BILINEAR))
        return img

    def finish(batch_u8, labels):
        """uint8 [B,H,W,C] -> model space with the reference pipeline's
        dequant/flip/scaling semantics (score_sde_jax/datasets.py:173-199)."""
        batch = np.stack([maybe_resize(im) for im in batch_u8]) \
            .astype(np.float32) / 255.0
        if random_flip:
            flips = rng.random(len(batch)) < 0.5
            batch[flips] = batch[flips, :, ::-1]
        if uniform_dequantization:
            batch = (rng.random(batch.shape).astype(np.float32)
                     + batch * 255.0) / 256.0
        if centered:
            batch = batch * 2.0 - 1.0
        if label_key is not None:
            return {"image": batch, "label": np.asarray(labels, np.int64)}
        return batch

    def epochs():
        while True:
            order = rng.permutation(len(index)) if shuffle \
                else np.arange(len(index))
            for b0 in range(0, len(order) - batch_size + 1, batch_size):
                recs = []
                for i in order[b0:b0 + batch_size]:
                    pi, off, length = index[i]
                    recs.append(bytes(blobs[pi][off:off + length]))
                labels = ([native.example_int64(r, label_key) for r in recs]
                          if label_key is not None else None)
                if shape_key is not None:
                    imgs = [decode_raw(r) for r in recs]
                else:
                    payloads = [bytes(native.example_bytes(r, image_key))
                                for r in recs]
                    imgs = decode_encoded_batch(payloads)
                yield finish(imgs, labels)
            if not repeat:
                return

    return prefetch_iterator(epochs(), depth=prefetch)


def _example_int64_list(rec: bytes, key: str):
    """All int64 values of a feature (the raw-tensor format stores the CHW
    shape as a 3-vector)."""
    from dpm_solver_tpu import native as _n

    rec = bytes(rec)
    span = _n._find_feature_py(rec, key)
    if span is None:
        raise KeyError(key)
    vals = []
    for f, wire, v, s, e in _n._walk_fields(rec, *span):
        if f == 3 and wire == 2:  # Int64List
            for lf, lw, lv, ls, le in _n._walk_fields(rec, s, e):
                if lf == 1 and lw == 0:
                    vals.append(lv)
                elif lf == 1 and lw == 2:  # packed
                    i = ls
                    while i < le:
                        pv, i = _n._varint(rec, i)
                        vals.append(pv)
    if not vals:
        raise KeyError(key)
    return vals


def lsun_dataset(root: str, *, resolution: int, batch_size: int,
                 centered: bool = False, random_flip: bool = True,
                 shuffle: bool = True, repeat: bool = True, seed: int = 0):
    """LSUN LMDB environment -> tf.data pipeline.

    Twin of the reference's ``LSUNClass`` (ddpm_and_guided-diffusion/
    datasets/lsun.py:12-58: lmdb env -> per-key image buffer -> PIL decode)
    and its LSUN transform chain (datasets/__init__.py: Resize +
    CenterCrop to ``image_size``). The LMDB file is read by the pure-Python
    B+tree reader in utils/lmdb.py — no lmdb C module required. Values are
    compressed image buffers (webp/jpeg); PIL decodes them host-side.
    """
    import tensorflow as tf

    from .utils.lmdb import LMDBReader

    tf.config.experimental.set_visible_devices([], "GPU")
    reader = LMDBReader(root)
    if len(reader) == 0:
        raise FileNotFoundError(f"LMDB at {root} holds no entries")

    # the native entry table (utils/lmdb_native.py) gives O(1) random access
    # to every record, so shuffling is a true full permutation per epoch —
    # the reference DataLoader's shuffle=True semantics — instead of a small
    # reservoir buffer; without a toolchain we fall back to ordered
    # iteration + buffer shuffle
    table = reader.entry_table()
    rng = np.random.RandomState(seed)

    def gen():
        import io

        from PIL import Image

        def decode(buf):
            img = Image.open(io.BytesIO(buf)).convert("RGB")
            return np.asarray(img, np.uint8)

        while True:
            if table is not None and len(table):
                order = (rng.permutation(len(table)) if shuffle
                         else np.arange(len(table)))
                for j in order:
                    yield decode(reader.read(int(table[j, 2]),
                                             int(table[j, 3])))
            else:
                for _, buf in reader.items():
                    yield decode(buf)
            if not repeat:
                return

    ds = tf.data.Dataset.from_generator(
        gen, output_signature=tf.TensorSpec((None, None, 3), tf.uint8))
    if shuffle and table is None:
        ds = ds.shuffle(512, seed=seed)

    def prep(img):
        shape = tf.shape(img)
        side = tf.minimum(shape[0], shape[1])
        img = tf.image.resize_with_crop_or_pad(img, side, side)
        img = tf.image.resize(img, (resolution, resolution),
                              method="bicubic", antialias=True)
        img = tf.clip_by_value(tf.cast(img, tf.float32) / 255.0, 0.0, 1.0)
        if random_flip:
            img = tf.image.random_flip_left_right(img)
        if centered:
            img = img * 2.0 - 1.0
        return img

    ds = ds.map(prep, num_parallel_calls=tf.data.AUTOTUNE)
    return ds.batch(batch_size, drop_remainder=True).prefetch(tf.data.AUTOTUNE)


# --------------------------------------------------------------------------- #
# dataset-specific geometry twins
#
# FID comparability against published numbers depends on EXACT crop/resize
# semantics, so each reference dataset's preprocessing is reproduced
# operation-for-operation (not through the generic center-square path).
# All functions map a uint8 HWC tensor -> float32 [0, 1] at `resolution`.
# --------------------------------------------------------------------------- #

# the ddpm example's CelebA window: 128x128 centered at (cx=89, cy=121) on
# the 178x218 aligned images -> rows [57, 185), cols [25, 153)
# (ddpm_and_guided-diffusion/datasets/__init__.py:60-66 with Crop at :14-27)
CELEBA_DDPM_WINDOW = (57, 185, 25, 153)


def celeba_ddpm_transform(img, resolution):
    """ddpm-example CelebA: fixed 128x128 crop + torchvision Resize
    (bilinear antialias) + ToTensor (datasets/__init__.py:60-92)."""
    import tensorflow as tf

    r0, r1, c0, c1 = CELEBA_DDPM_WINDOW
    img = img[r0:r1, c0:c1, :]
    img = tf.image.resize(tf.cast(img, tf.float32),
                          (resolution, resolution), method="bilinear",
                          antialias=True)
    return tf.clip_by_value(img / 255.0, 0.0, 1.0)


def _central_crop_tf(img, size):
    """(score_sde_jax/datasets.py:63-67; dynamic-shape safe)"""
    import tensorflow as tf

    shape = tf.shape(img)
    top = (shape[0] - size) // 2
    left = (shape[1] - size) // 2
    return img[top:top + size, left:left + size, :]


def _resize_small_tf(img, resolution):
    """Shrink so the SHORT side equals `resolution`, preserving aspect
    (score_sde_jax/datasets.py:54-60; bilinear antialias)."""
    import tensorflow as tf

    shape = tf.shape(img)
    hw = tf.cast(shape[:2], tf.float32)
    ratio = float(resolution) / tf.reduce_min(hw)
    new_hw = tf.cast(tf.round(hw * ratio), tf.int32)
    return tf.image.resize(img, new_hw, antialias=True)


def celeba_scoresde_transform(img, resolution):
    """score_sde CelebA: to-float -> central_crop(140) -> resize_small
    (score_sde_jax/datasets.py:126-129). Crop FIRST, then shrink."""
    import tensorflow as tf

    img = tf.image.convert_image_dtype(img, tf.float32)
    return _resize_small_tf(_central_crop_tf(img, 140), resolution)


def crop_resize_tf(img, resolution):
    """Center-square crop then BICUBIC antialias resize, cast back to uint8
    BEFORE the float conversion (score_sde_jax/datasets.py:40-52 — the
    uint8 round-trip is part of the reference semantics)."""
    import tensorflow as tf

    shape = tf.shape(img)
    h, w = shape[0], shape[1]
    crop = tf.minimum(h, w)
    img = img[(h - crop) // 2:(h + crop) // 2,
              (w - crop) // 2:(w + crop) // 2]
    img = tf.image.resize(img, (resolution, resolution),
                          method="bicubic", antialias=True)
    return tf.cast(img, tf.uint8)


def lsun_scoresde_transform(img, resolution):
    """score_sde LSUN: at 128px shrink-then-center-crop, otherwise
    crop_resize (score_sde_jax/datasets.py:136-149)."""
    import tensorflow as tf

    if resolution == 128:
        img = tf.image.convert_image_dtype(img, tf.float32)
        img = _resize_small_tf(img, resolution)
        return _central_crop_tf(img, resolution)
    img = crop_resize_tf(img, resolution)
    return tf.image.convert_image_dtype(img, tf.float32)


DATASET_TRANSFORMS = {
    "celeba_ddpm": celeba_ddpm_transform,
    "celeba_scoresde": celeba_scoresde_transform,
    "lsun_scoresde": lsun_scoresde_transform,
}


def image_folder_dataset(path: str, *, resolution: int, batch_size: int,
                         centered: bool = False, random_flip: bool = True,
                         shuffle: bool = True, repeat: bool = True,
                         seed: int = 0, transform: Optional[str] = None):
    """PNG/JPEG folder -> tf.data pipeline. `transform` selects a
    dataset-specific geometry twin from DATASET_TRANSFORMS (exact reference
    crop/resize semantics); default is the generic bicubic central-crop
    resize (ref datasets.py crop_resize / FFHQ handling)."""
    import tensorflow as tf

    tf.config.experimental.set_visible_devices([], "GPU")
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.lower().endswith((".png", ".jpg", ".jpeg")))
    if not files:
        raise FileNotFoundError(f"no images under {path}")
    ds = tf.data.Dataset.from_tensor_slices(files)
    if repeat:
        ds = ds.repeat()
    if shuffle:
        ds = ds.shuffle(min(len(files), 10_000), seed=seed)
    tf_fn = DATASET_TRANSFORMS.get(transform) if transform else None
    if transform and tf_fn is None:
        raise ValueError(f"unknown transform {transform!r}; "
                         f"have {sorted(DATASET_TRANSFORMS)}")

    def load(fname):
        img = tf.image.decode_image(tf.io.read_file(fname), channels=3,
                                    expand_animations=False)
        if tf_fn is not None:
            img = tf.clip_by_value(tf_fn(img, resolution), 0.0, 1.0)
        else:
            shape = tf.shape(img)
            side = tf.minimum(shape[0], shape[1])
            img = tf.image.resize_with_crop_or_pad(img, side, side)
            img = tf.image.resize(img, (resolution, resolution),
                                  method="bicubic", antialias=True)
            img = tf.clip_by_value(tf.cast(img, tf.float32) / 255.0, 0.0, 1.0)
        if random_flip:
            img = tf.image.random_flip_left_right(img)
        if centered:
            img = img * 2.0 - 1.0
        return img

    ds = ds.map(load, num_parallel_calls=tf.data.AUTOTUNE)
    return ds.batch(batch_size, drop_remainder=True).prefetch(tf.data.AUTOTUNE)


# ---------------------------------------------------------------- superres


def superres_example(image_u8, *, size: int, downscale_f: int = 4,
                     degradation: str = "bsrgan_light",
                     min_crop_f: float = 0.5, max_crop_f: float = 1.0,
                     center_crop: bool = False, rng=None):
    """One blind-SR training example from a uint8 HWC image.

    Twin of `ImageNetSR.__getitem__` (examples/stable-diffusion/ldm/data/
    imagenet.py:272-372): random-side square crop (side = min_side *
    U[min_crop_f, max_crop_f], random or center), INTER_AREA resize to
    `size`, then the selected degradation -> {'image', 'LR_image'} both
    float32 HWC in [-1, 1]. `degradation` is 'bsrgan', 'bsrgan_light', or
    one of the cv_* / pil_* interpolation names of imagenet.py:313-325.
    """
    import cv2

    from dpm_solver_tpu.utils import degradation as D

    rng = np.random.default_rng(rng) \
        if not isinstance(rng, np.random.Generator) else rng
    assert size % downscale_f == 0
    lr_size = size // downscale_f
    img = np.asarray(image_u8, np.uint8)
    h, w = img.shape[:2]
    side = int(min(h, w) * rng.uniform(min_crop_f, max_crop_f))
    if center_crop:
        top, left = (h - side) // 2, (w - side) // 2
    else:
        top = int(rng.integers(0, h - side + 1))
        left = int(rng.integers(0, w - side + 1))
    img = img[top:top + side, left:left + side]
    img = cv2.resize(img, (size, size), interpolation=cv2.INTER_AREA)

    if degradation in ("bsrgan", "bsrgan_light"):
        lr = D.degradation_bsrgan_variant(
            img, sf=downscale_f, rng=rng,
            light=(degradation == "bsrgan_light"))["image"]
    elif degradation.startswith("cv_"):
        code = {"cv_nearest": cv2.INTER_NEAREST,
                "cv_bilinear": cv2.INTER_LINEAR,
                "cv_bicubic": cv2.INTER_CUBIC,
                "cv_area": cv2.INTER_AREA,
                "cv_lanczos": cv2.INTER_LANCZOS4}[degradation]
        lr = cv2.resize(img, (lr_size, lr_size), interpolation=code)
    elif degradation.startswith("pil_"):
        from PIL import Image

        code = {"pil_nearest": Image.NEAREST,
                "pil_bilinear": Image.BILINEAR,
                "pil_bicubic": Image.BICUBIC,
                "pil_box": Image.BOX,
                "pil_hamming": Image.HAMMING,
                "pil_lanczos": Image.LANCZOS}[degradation]
        lr = np.asarray(Image.fromarray(img).resize((lr_size, lr_size),
                                                    code), np.uint8)
    else:
        raise ValueError(f"unknown degradation {degradation!r}")
    return {"image": (img / 127.5 - 1.0).astype(np.float32),
            "LR_image": (lr / 127.5 - 1.0).astype(np.float32)}


def superres_dataset(path: str, *, size: int, batch_size: int,
                     downscale_f: int = 4,
                     degradation: str = "bsrgan_light",
                     min_crop_f: float = 0.5, max_crop_f: float = 1.0,
                     center_crop: bool = False, seed: int = 0,
                     repeat: bool = True):
    """Image folder -> iterator of {'image', 'LR_image'} numpy batches for
    SR-LDM training (host-side numpy: the BSRGAN pipeline is cv2/scipy
    work that has no business inside a jitted graph)."""
    from PIL import Image

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.lower().endswith((".png", ".jpg", ".jpeg")))
    if not files:
        raise FileNotFoundError(f"no images under {path}")
    rng = np.random.default_rng(seed)

    def gen():
        while True:
            order = rng.permutation(len(files))
            hqs, lrs = [], []
            for i in order:
                img = Image.open(files[i])
                if img.mode != "RGB":
                    img = img.convert("RGB")
                ex = superres_example(
                    np.asarray(img, np.uint8), size=size,
                    downscale_f=downscale_f, degradation=degradation,
                    min_crop_f=min_crop_f, max_crop_f=max_crop_f,
                    center_crop=center_crop, rng=rng)
                hqs.append(ex["image"])
                lrs.append(ex["LR_image"])
                if len(hqs) == batch_size:
                    yield {"image": np.stack(hqs), "LR_image": np.stack(lrs)}
                    hqs, lrs = [], []
            if not repeat:
                return

    return gen()


# ------------------------------------------------------- TFDS on-disk reader


def _tfds_locate(data_dir: str, name: Optional[str], split: str):
    """Resolve a TFDS directory (data_dir[/name]/version) and its split
    shard files + feature spec, without tensorflow_datasets installed."""
    import json

    def _version_key(d):
        # numeric-aware so 10.0.0 beats 9.0.0 (plain sort would not)
        parts = d.split(".")
        if all(p.isdigit() for p in parts):
            return (1, tuple(int(p) for p in parts))
        return (0, d)

    root = data_dir
    if name is not None and os.path.isdir(os.path.join(data_dir, name)):
        root = os.path.join(data_dir, name)
    # descend config/version directories until dataset_info.json appears
    for depth in range(3):
        if os.path.exists(os.path.join(root, "dataset_info.json")):
            break
        subs = sorted(
            (d for d in os.listdir(root)
             if os.path.isdir(os.path.join(root, d))), key=_version_key)
        if not subs:
            break
        if depth == 0 and name is None and len(subs) > 1 \
                and not all(s[0].isdigit() for s in subs):
            raise ValueError(f"ambiguous TFDS dir {data_dir}: "
                             f"pass name= (candidates: {subs})")
        root = os.path.join(root, subs[-1])  # latest version
    info_path = os.path.join(root, "dataset_info.json")
    if not os.path.exists(info_path):
        raise FileNotFoundError(f"no dataset_info.json under {data_dir}")
    with open(info_path) as f:
        info = json.load(f)
    ds_name = info.get("name", name or "dataset")
    splits = {s["name"]: s for s in info.get("splits", [])}
    if split not in splits:
        raise ValueError(f"split {split!r} not in {sorted(splits)}")
    n_shards = len(splits[split].get("shardLengths", [])) or 1
    template = splits[split].get(
        "filepathTemplate",
        "{DATASET}-{SPLIT}.{FILEFORMAT}-{SHARD_X_OF_Y}")
    files = []
    for i in range(n_shards):
        fname = (template
                 .replace("{DATASET}", ds_name)
                 .replace("{SPLIT}", split)
                 .replace("{FILEFORMAT}", "tfrecord")
                 .replace("{SHARD_X_OF_Y}", f"{i:05d}-of-{n_shards:05d}"))
        files.append(os.path.join(root, fname))
    missing = [f for f in files if not os.path.exists(f)]
    if missing:
        raise FileNotFoundError(f"missing shards, e.g. {missing[0]}")

    feat_path = os.path.join(root, "features.json")
    image_key, label_key = "image", None
    if os.path.exists(feat_path):
        with open(feat_path) as f:
            feats = json.load(f)
        # TFDS nests the mapping as [content ->] featuresDict -> features
        # (older versions flatten differently); walk to the leaf dict
        content = feats.get("content", feats)
        if "featuresDict" in content:
            content = content["featuresDict"]
        if "features" in content:
            content = content["features"]
        if "featuresDict" in content:
            content = content["featuresDict"].get("features", {})
        if not isinstance(content, dict):
            content = {}
        for key, spec in content.items():
            kind = json.dumps(spec)
            if "Image" in kind and image_key == "image":
                image_key = key
            if "ClassLabel" in kind:
                label_key = key
    return files, image_key, label_key


def tfds_dataset(data_dir: str, *, name: Optional[str] = None,
                 split: str = "train", resolution: int = 0,
                 batch_size: int = 128,
                 uniform_dequantization: bool = False,
                 centered: bool = False, random_flip: bool = False,
                 shuffle: bool = True, repeat: bool = True, seed: int = 0,
                 transform: Optional[str] = None, with_labels: bool = False):
    """Read a prepared tensorflow_datasets directory WITHOUT the tfds
    package (zero-egress twin of the reference's `tfds.builder(...)` +
    `as_dataset` path, score_sde_jax/datasets.py:103-199): locates the
    version dir, parses dataset_info.json / features.json, decodes the
    encoded-image Example records, and applies the same preprocessing
    surface as the other pipelines here (`transform` selects the
    dataset-specific geometry twin, e.g. 'celeba_scoresde' / 'lsun')."""
    import tensorflow as tf

    tf.config.experimental.set_visible_devices([], "GPU")
    files, image_key, label_key = _tfds_locate(data_dir, name, split)
    if with_labels and label_key is None:
        raise ValueError("with_labels=True but no ClassLabel feature "
                         "detected in features.json")
    ds = tf.data.TFRecordDataset(files)
    if repeat:
        ds = ds.repeat()
    if shuffle:
        ds = ds.shuffle(10_000, seed=seed)
    tf_fn = DATASET_TRANSFORMS.get(transform) if transform else None
    if transform and tf_fn is None:
        raise ValueError(f"unknown transform {transform!r}; "
                         f"have {sorted(DATASET_TRANSFORMS)}")

    def parse(record):
        spec = {image_key: tf.io.FixedLenFeature([], tf.string)}
        if label_key:
            spec[label_key] = tf.io.FixedLenFeature([], tf.int64,
                                                    default_value=-1)
        ex = tf.io.parse_single_example(record, spec)
        img = tf.image.decode_image(ex[image_key], channels=3,
                                    expand_animations=False)
        if tf_fn is not None:
            img = tf.clip_by_value(tf_fn(img, resolution), 0.0, 1.0)
        else:
            img = tf.image.convert_image_dtype(img, tf.float32)
            if resolution:
                img = tf.image.resize(img, (resolution, resolution),
                                      antialias=True)
        if random_flip:
            img = tf.image.random_flip_left_right(img)
        if uniform_dequantization:
            img = (tf.random.uniform(tf.shape(img)) + img * 255.0) / 256.0
        if centered:
            img = img * 2.0 - 1.0
        if with_labels and label_key:
            return {"image": img, "label": ex[label_key]}
        return img

    ds = ds.map(parse, num_parallel_calls=tf.data.AUTOTUNE)
    return ds.batch(batch_size, drop_remainder=True).prefetch(tf.data.AUTOTUNE)
