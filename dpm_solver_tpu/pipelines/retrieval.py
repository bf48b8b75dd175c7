"""Retrieval-augmented generation (knn2img / RDM).

TPU-native rebuild of examples/stable-diffusion/scripts/knn2img.py: a CLIP
joint-space nearest-neighbour `Searcher` over a patch-embedding database plus
a sampling front end that conditions a latent-diffusion model on
[text query ; k retrieved image embeddings].

Where the reference leans on the `scann` C++ library configured as
brute-force scoring (knn2img.py:75-84: ``score_brute_force().build()``),
we run the same exact normalized dot-product top-k directly on the
accelerator — one (Q,D)x(D,N) matmul + `lax.top_k`, which maps straight
onto the MXU and needs no ANN library at all. Database format is the
reference's: ``.npz`` files with ``embedding`` / ``img_id`` /
``patch_coords`` arrays (knn2img.py:68-119).
"""

from __future__ import annotations

import glob
import os
import time
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dpm_solver_tpu.pipelines.stable_diffusion import DPMSolverSampler, LatentDiffusion


class Searcher:
    """Exact top-k CLIP-space retrieval over an in-memory database.

    ``database`` may be a dict with an ``embedding`` (N, D) array (plus
    optional ``img_id`` / ``patch_coords``), a path to one ``.npz``, or a
    directory of ``.npz`` shards (concatenated, matching the reference's
    multi-file loader at knn2img.py:103-119).
    """

    def __init__(self, database):
        if isinstance(database, str):
            database = self._load(database)
        emb = np.asarray(database["embedding"], np.float32)
        if emb.ndim != 2:
            raise ValueError(f"embedding must be (N, D), got {emb.shape}")
        self.database = dict(database)
        self.database["embedding"] = emb
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        # device-resident, normalized, transposed for the (Q,D)x(D,N) matmul
        self._dbT = jnp.asarray((emb / np.maximum(norms, 1e-12)).T)

    @staticmethod
    def _load(path: str) -> dict:
        files = sorted(glob.glob(os.path.join(path, "*.npz"))) \
            if os.path.isdir(path) else [path]
        if not files:
            raise FileNotFoundError(f"no .npz database under {path}")
        shards = []
        keys = None
        for f in files:
            with np.load(f) as z:
                # every shard must carry the same keys, or concatenated
                # metadata would silently misalign with the embeddings
                if keys is None:
                    keys = set(z.files)
                elif set(z.files) != keys:
                    raise ValueError(
                        f"database shard {f} carries keys {sorted(z.files)} "
                        f"but {files[0]} carries {sorted(keys)}")
                shards.append({k: z[k] for k in z.files})
        return {key: (shards[0][key] if len(shards) == 1
                      else np.concatenate([s[key] for s in shards]))
                for key in keys}

    def __len__(self) -> int:
        return self._dbT.shape[1]

    def search(self, x, k: int) -> dict:
        """Return the reference's result dict (knn2img.py:134-159):
        normalized ``nn_embeddings`` (Q, k, D), ``img_ids``,
        ``patch_coords``, ``nns`` indices, ``q_embeddings``."""
        x = np.asarray(x, np.float32)
        if x.ndim == 3:  # (B, n_repeat, D) conditioning -> first token
            x = x[:, 0]
        q = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)

        start = time.time()
        k = min(k, len(self))
        scores = jnp.asarray(q) @ self._dbT
        _, nns = jax.lax.top_k(scores, k)
        nns = np.asarray(nns)
        elapsed = time.time() - start

        emb = self.database["embedding"][nns]
        emb = emb / np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        out = {
            "nn_embeddings": emb,
            "queries": x,
            "exec_time": elapsed,
            "nns": nns,
            "q_embeddings": q,
        }
        for src, dst in (("img_id", "img_ids"), ("patch_coords", "patch_coords")):
            if src in self.database:
                out[dst] = np.asarray(self.database[src])[nns]
        return out

    def __call__(self, x, n: int) -> dict:
        return self.search(x, n)


def build_image_database(images, image_embedder, *, img_ids=None,
                         batch_size: int = 64, save_path: Optional[str] = None):
    """Embed images ([-1,1] NHWC array or iterable of batches) into a
    reference-format database dict; optionally save as one ``.npz``.

    Stands in for the reference's pre-built artbench/openimages databases
    (which this zero-egress image cannot download)."""
    chunks = []
    if hasattr(images, "shape"):
        images = [images[i:i + batch_size]
                  for i in range(0, images.shape[0], batch_size)]
    for batch in images:
        chunks.append(np.asarray(image_embedder(jnp.asarray(batch))))
    emb = np.concatenate(chunks).astype(np.float32)
    db = {
        "embedding": emb,
        "img_id": np.asarray(img_ids if img_ids is not None
                             else np.arange(len(emb))),
        "patch_coords": np.zeros((len(emb), 4), np.int32),
    }
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        np.savez(save_path, **db)
    return db


def knn2img(model: LatentDiffusion, prompts: Sequence[str], *,
            text_embedder: Callable, searcher: Optional[Searcher] = None,
            knn: int = 10, steps: int = 50, guidance_scale: float = 5.0,
            height: int = 768, width: int = 768, rng=None, order: int = 2,
            method: str = "multistep", return_nn_info: bool = False):
    """Sample images conditioned on [CLIP(text) ; k retrieved neighbours].

    Mirrors the knn2img main loop (knn2img.py:348-375): the conditioning is
    the normalized joint text embedding (B, n_repeat, D), optionally
    concatenated with the k nearest database embeddings along the token
    axis, with the unconditional branch = zeros (``uc = torch.zeros_like(c)``
    at :363) — NOT an empty-prompt encoding as in txt2img.

    ``text_embedder`` maps prompts -> (B, n, D) joint-space embeddings
    (FrozenCLIPTextJointEmbedder or a test stub). The latent shape follows
    the reference's f16/z16 RDM convention via the model's own first stage.
    """
    if isinstance(prompts, str):
        prompts = [prompts]
    b = len(prompts)
    c = jnp.asarray(text_embedder(prompts))
    if c.ndim == 2:
        c = c[:, None, :]

    nn_info = None
    if searcher is not None and knn > 0:
        nn_info = searcher(np.asarray(c), knn)
        c = jnp.concatenate(
            [c, jnp.asarray(nn_info["nn_embeddings"], c.dtype)], axis=1)

    uc = jnp.zeros_like(c) if guidance_scale != 1.0 else None

    f = 2 ** (len(model.vae.config.ch_mult) - 1)
    shape = (height // f, width // f, model.vae.config.z_channels)
    rng = jax.random.PRNGKey(0) if rng is None else rng
    sampler = DPMSolverSampler(model)
    latents, _ = sampler.sample(
        steps, b, shape, c, unconditional_guidance_scale=guidance_scale,
        unconditional_conditioning=uc, rng=rng, order=order, method=method,
        return_intermediate=False)
    img = model.decode_first_stage(latents)
    img = jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)
    return (img, nn_info) if return_nn_info else img
