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

import flax.linen as nn
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


class FrozenCLIPTextJointEmbedder:
    """prompts -> L2-normalized CLIP *joint-space* embeddings (B, n_repeat, D).

    Twin of the reference's FrozenCLIPTextEmbedder
    (ldm/modules/encoders/modules.py:165-194): the projected pooled text
    feature, normalized, repeated k times along the token axis — the
    conditioning space of the retrieval-augmented (knn2img) models, shared
    with the image embedder so text queries can search an image database.
    """

    def __init__(self, version: str = "openai/clip-vit-large-patch14",
                 max_length: int = 77, n_repeat: int = 1,
                 normalize: bool = True, from_pt: bool = False):
        from transformers import CLIPTokenizer, FlaxCLIPModel

        self.tokenizer = CLIPTokenizer.from_pretrained(version)
        self.model = FlaxCLIPModel.from_pretrained(version, from_pt=from_pt)
        self.max_length = max_length
        self.n_repeat = n_repeat
        self.normalize = normalize

    def __call__(self, prompts: Union[str, Sequence[str]]):
        if isinstance(prompts, str):
            prompts = [prompts]
        batch = self.tokenizer(
            list(prompts), truncation=True, max_length=self.max_length,
            padding="max_length", return_tensors="np")
        z = self.model.get_text_features(input_ids=batch["input_ids"])
        if self.normalize:
            z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
        return jnp.repeat(z[:, None, :], self.n_repeat, axis=1)

    def encode(self, prompts):
        return self(prompts)


class FrozenCLIPImageEmbedder:
    """images in [-1,1] NHWC -> CLIP joint-space embeddings (B, D).

    Twin of FrozenClipImageEmbedder (modules.py:197-228): bicubic resize to
    224, CLIP mean/std normalization, projected image feature. Used both to
    build retrieval databases and to embed query images.
    """

    MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

    def __init__(self, version: str = "openai/clip-vit-large-patch14",
                 normalize: bool = True, from_pt: bool = False):
        from transformers import FlaxCLIPModel

        self.model = FlaxCLIPModel.from_pretrained(version, from_pt=from_pt)
        self.normalize = normalize

    def preprocess(self, x):
        import jax

        x = jax.image.resize(
            x, (x.shape[0], 224, 224, x.shape[-1]), method="bicubic")
        x = (x + 1.0) / 2.0
        return (x - self.MEAN) / self.STD

    def __call__(self, x):
        # transformers Flax CLIP takes NCHW pixel_values
        z = self.model.get_image_features(
            pixel_values=jnp.transpose(self.preprocess(x), (0, 3, 1, 2)))
        if self.normalize:
            z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
        return z


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


class SpatialRescaler(nn.Module):
    """Spatial conditioning rescaler (ldm/modules/encoders/modules.py:106-135):
    n_stages of `multiplier`x resize, optional 1x1 channel remap. Used by
    layout/segmentation-conditioned LDMs. NHWC."""

    n_stages: int = 1
    method: str = "bilinear"
    multiplier: float = 0.5
    out_channels: Optional[int] = None
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        import jax

        for _ in range(self.n_stages):
            b, h, w, c = x.shape
            x = jax.image.resize(
                x, (b, max(1, int(h * self.multiplier)),
                    max(1, int(w * self.multiplier)), c), self.method)
        if self.out_channels is not None:
            x = nn.Conv(self.out_channels, (1, 1), use_bias=self.use_bias,
                        name="channel_mapper")(x)
        return x

    def encode(self, x):
        return self(x)


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


class BERTEmbedder(nn.Module):
    """Legacy LDM text encoder: a from-scratch transformer over BERT tokens
    (ref ldm/modules/encoders/modules.py:80-101 over x_transformer.py with
    Encoder defaults: pre-LN, 8 heads of 64, bias-free qkv, GELU FF x4,
    learned absolute positions, final LayerNorm, return_embeddings).

    Tokenization is external (pass token ids); the reference uses a
    HuggingFace BertTokenizerFast (vocab 30522).
    """

    n_embed: int
    n_layer: int
    vocab_size: int = 30522
    max_seq_len: int = 77
    num_heads: int = 8
    head_dim: int = 64

    @nn.compact
    def __call__(self, tokens, *, deterministic: bool = True):
        d = self.n_embed
        inner = self.num_heads * self.head_dim
        x = nn.Embed(self.vocab_size, d, name="token_emb")(tokens)
        pos = nn.Embed(self.max_seq_len, d, name="pos_emb")(
            jnp.arange(tokens.shape[1]))
        x = x + pos[None]
        for i in range(self.n_layer):
            h = nn.LayerNorm(epsilon=1e-5, name=f"attn_norm_{i}")(x)
            q = nn.Dense(inner, use_bias=False, name=f"to_q_{i}")(h)
            k = nn.Dense(inner, use_bias=False, name=f"to_k_{i}")(h)
            v = nn.Dense(inner, use_bias=False, name=f"to_v_{i}")(h)
            from dpm_solver_tpu.ops.attention import token_attention

            a = token_attention(q, k, v, num_heads=self.num_heads)
            x = x + nn.Dense(d, name=f"to_out_{i}")(a)
            h = nn.LayerNorm(epsilon=1e-5, name=f"ff_norm_{i}")(x)
            h = nn.gelu(nn.Dense(4 * d, name=f"ff_in_{i}")(h),
                        approximate=False)
            x = x + nn.Dense(d, name=f"ff_out_{i}")(h)
        return nn.LayerNorm(epsilon=1e-5, name="final_norm")(x)


def convert_bert_embedder(state_dict, n_layer: int):
    """x_transformer TransformerWrapper torch weights -> BERTEmbedder params.

    Key layout (ref x_transformer.py:548-641): transformer.token_emb,
    transformer.pos_emb.emb, transformer.attn_layers.layers.{2i}.1.{to_q,...}
    (attention blocks at even indices, ff at odd; each wrapped with a .0
    pre-norm), transformer.norm.
    """
    import numpy as np

    # inside BERTEmbedder the wrapper lives under "transformer."; a bare
    # TransformerWrapper state dict has no prefix
    pre = "transformer." if any(k.startswith("transformer.")
                                for k in state_dict) else ""

    def t(k):
        return np.asarray(state_dict[k if pre else k[len("transformer."):]])

    p = {
        "token_emb": {"embedding": t("transformer.token_emb.weight")},
        "pos_emb": {"embedding": t("transformer.pos_emb.emb.weight")},
        "final_norm": {"scale": t("transformer.norm.weight"),
                       "bias": t("transformer.norm.bias")},
    }
    for i in range(n_layer):
        a = f"transformer.attn_layers.layers.{2 * i}"
        f = f"transformer.attn_layers.layers.{2 * i + 1}"
        p[f"attn_norm_{i}"] = {"scale": t(f"{a}.0.weight"),
                               "bias": t(f"{a}.0.bias")}
        for name in ("to_q", "to_k", "to_v"):
            p[f"{name}_{i}"] = {"kernel": t(f"{a}.1.{name}.weight").T}
        p[f"to_out_{i}"] = {"kernel": t(f"{a}.1.to_out.weight").T,
                            "bias": t(f"{a}.1.to_out.bias")}
        p[f"ff_norm_{i}"] = {"scale": t(f"{f}.0.weight"),
                             "bias": t(f"{f}.0.bias")}
        p[f"ff_in_{i}"] = {"kernel": t(f"{f}.1.net.0.0.weight").T,
                           "bias": t(f"{f}.1.net.0.0.bias")}
        p[f"ff_out_{i}"] = {"kernel": t(f"{f}.1.net.2.weight").T,
                            "bias": t(f"{f}.1.net.2.bias")}
    return {"params": p}
