"""Frozen CLIP text encoder glue (Stable Diffusion's cond stage).

The reference wraps transformers' torch CLIP
(examples/stable-diffusion/ldm/modules/encoders/modules.py:137-160,
FrozenCLIPEmbedder: tokenizer + CLIPTextModel.last_hidden_state, max_length
77). We do the same through transformers' *Flax* CLIP so the text encoder
runs in the same XLA world as the UNet — no torch on the TPU path.

Zero-egress environments: pass a local `version` directory (a pretrained
CLIP checkout); there is no network fallback. `encode_fn` is the injection
point for tests / custom encoders.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np


class FrozenCLIPEmbedder:
    """prompts -> (B, max_length, 768) context array.

    Mirrors the reference constructor (version, max_length); `from_pt=True`
    converts a torch CLIP checkpoint on load.
    """

    def __init__(self, version: str = "openai/clip-vit-large-patch14",
                 max_length: int = 77, from_pt: bool = False):
        from transformers import CLIPTokenizer, FlaxCLIPTextModel

        self.tokenizer = CLIPTokenizer.from_pretrained(version)
        self.model = FlaxCLIPTextModel.from_pretrained(version, from_pt=from_pt)
        self.max_length = max_length

    def __call__(self, prompts: Union[str, Sequence[str]]):
        return self.encode(prompts)

    def encode(self, prompts: Union[str, Sequence[str]]):
        if isinstance(prompts, str):
            prompts = [prompts]
        batch = self.tokenizer(
            list(prompts), truncation=True, max_length=self.max_length,
            padding="max_length", return_tensors="np")
        out = self.model(input_ids=batch["input_ids"])
        return jnp.asarray(out.last_hidden_state)


def constant_context_encoder(context_dim: int, max_length: int = 77,
                             seed: int = 0) -> Callable:
    """Deterministic stand-in encoder for tests and smoke runs: hashes each
    prompt to a fixed pseudo-random (max_length, context_dim) block."""

    def encode(prompts: Union[str, Sequence[str]]):
        if isinstance(prompts, str):
            prompts = [prompts]
        rows = []
        for p in prompts:
            h = abs(hash((seed, p))) % (2 ** 31)
            rows.append(np.random.RandomState(h).randn(
                max_length, context_dim).astype(np.float32))
        return jnp.asarray(np.stack(rows))

    return encode


class ClassEmbedder:
    """Class-label conditioner for class-conditional LDMs (ref
    ldm/modules/encoders/modules.py ClassEmbedder used by the cin256
    configs + scripts/sample_diffusion.py): labels -> (B, 1, embed_dim)
    cross-attention context."""

    def __init__(self, num_classes: int, embed_dim: int, seed: int = 0,
                 embedding=None):
        import flax.linen as nn
        import jax

        self._module = nn.Embed(num_classes, embed_dim)
        if embedding is not None:
            self.params = {"params": {"embedding": np.asarray(embedding)}}
        else:
            self.params = self._module.init(
                jax.random.PRNGKey(seed), jnp.zeros((1,), jnp.int32))

    def __call__(self, labels):
        labels = jnp.asarray(labels, jnp.int32)
        return self._module.apply(self.params, labels)[:, None, :]
