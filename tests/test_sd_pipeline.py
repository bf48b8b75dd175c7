"""Stable-Diffusion pipeline tests: end-to-end txt2img/img2img on tiny
random-init modules, adapter time converters, and full-checkpoint routing."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE_ROOT, requires_reference

from dpm_solver_tpu.models.adm_unet import ADMConfig, ADMUNet
from dpm_solver_tpu.models.text_encoder import constant_context_encoder
from dpm_solver_tpu.models.vae import AutoencoderKL, VAEConfig
from dpm_solver_tpu.pipelines import (
    DPMSolverSampler,
    LatentDiffusion,
    StableDiffusionPipeline,
    load_sd_checkpoint,
    make_ldm_betas,
)


def _tiny_ldm(context_dim=24):
    ucfg = ADMConfig(image_size=8, in_channels=4, model_channels=32,
                     out_channels=4, num_res_blocks=1,
                     attention_resolutions=(1, 2), channel_mult=(1, 2),
                     num_heads=2, use_spatial_transformer=True,
                     transformer_depth=1, context_dim=context_dim)
    vcfg = VAEConfig.tiny(resolution=16, attn_resolutions=())
    unet = ADMUNet(config=ucfg)
    vae = AutoencoderKL(config=vcfg)
    k = jax.random.PRNGKey(0)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.ones((1,)), None,
                   jnp.zeros((1, 7, context_dim)), deterministic=True)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)))
    return LatentDiffusion(unet=unet, unet_params=up, vae=vae, vae_params=vp,
                           text_encode=constant_context_encoder(context_dim))


def test_txt2img_end_to_end():
    pipe = StableDiffusionPipeline(_tiny_ldm())
    img = pipe.txt2img(["a tiny astronaut", "a teapot"], steps=6,
                       guidance_scale=7.5, height=16, width=16,
                       rng=jax.random.PRNGKey(3))
    img = np.asarray(img)
    assert img.shape == (2, 16, 16, 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0
    # CFG determinism: same rng -> same image
    img2 = np.asarray(pipe.txt2img(["a tiny astronaut", "a teapot"], steps=6,
                                   guidance_scale=7.5, height=16, width=16,
                                   rng=jax.random.PRNGKey(3)))
    np.testing.assert_array_equal(img, img2)


def test_img2img_end_to_end():
    pipe = StableDiffusionPipeline(_tiny_ldm())
    init = jnp.asarray(np.random.RandomState(0).uniform(
        -1, 1, (2, 16, 16, 3)).astype(np.float32))
    img = pipe.img2img(init, ["repaint it", "another"], strength=0.6,
                       steps=8, rng=jax.random.PRNGKey(5))
    img = np.asarray(img)
    assert img.shape == (2, 16, 16, 3)
    assert np.isfinite(img).all()


def test_sampler_encode_decode_cycle():
    """Deterministic ODE encode then sample back should roughly invert when
    the net is smooth (random-init nets are; tolerance is loose)."""
    ldm = _tiny_ldm()
    sampler = DPMSolverSampler(ldm)
    cond = ldm.get_learned_conditioning(["p", "q"])
    z0 = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 4)
                     .astype(np.float32) * 0.2)
    z_enc, _ = sampler.encode(12, z0, 0.5, cond)
    assert np.isfinite(np.asarray(z_enc)).all()
    z_back, _ = sampler.sample(12, 2, (8, 8, 4), cond, x_T=z_enc,
                               t_start=sampler.ratio_to_time(0.5))
    err = np.abs(np.asarray(z_back) - np.asarray(z0)).mean()
    assert err < 0.2, err


def test_time_ratio_converters():
    sampler = DPMSolverSampler(_tiny_ldm())
    n = sampler.noise_schedule.total_N
    assert np.isclose(sampler.ratio_to_time(0.0), 1.0 / n)
    assert np.isclose(sampler.ratio_to_time(1.0), 1.0)
    assert np.isclose(sampler.time_discrete_to_continuous(n - 1), 1.0)
    assert np.isclose(
        sampler.time_continuous_to_discrete(
            sampler.time_discrete_to_continuous(123.0)), 123.0)
    assert np.isclose(sampler.time_to_ratio(sampler.ratio_to_time(0.37)), 0.37)


def test_ldm_betas_match_reference_formula():
    betas = make_ldm_betas()
    assert betas.shape == (1000,)
    want = np.linspace(0.00085 ** 0.5, 0.0120 ** 0.5, 1000) ** 2
    np.testing.assert_allclose(betas, want)


@requires_reference
def test_load_sd_checkpoint_routing():
    """Assemble a synthetic CompVis-style checkpoint from tiny torch modules
    and check both converters are routed and produce matching forwards."""
    import torch

    sd_dir = str(REFERENCE_ROOT / "examples" / "stable-diffusion")
    if sd_dir not in sys.path:
        sys.path.insert(0, sd_dir)
    import types
    if "omegaconf" not in sys.modules:
        lc = types.ModuleType("omegaconf.listconfig")
        lc.ListConfig = type("ListConfig", (), {})
        pkg = types.ModuleType("omegaconf")
        pkg.listconfig = lc
        sys.modules["omegaconf"] = pkg
        sys.modules["omegaconf.listconfig"] = lc
    from ldm.modules.diffusionmodules import model as ref_vae
    from ldm.modules.diffusionmodules import openaimodel

    ucfg = ADMConfig(image_size=8, in_channels=4, model_channels=32,
                     out_channels=4, num_res_blocks=1,
                     attention_resolutions=(1,), channel_mult=(1, 2),
                     num_heads=2, use_spatial_transformer=True,
                     transformer_depth=1, context_dim=24)
    vcfg = VAEConfig.tiny(resolution=16, attn_resolutions=())

    torch.manual_seed(0)
    tunet = openaimodel.UNetModel(
        image_size=8, in_channels=4, model_channels=32, out_channels=4,
        num_res_blocks=1, attention_resolutions=(1,), channel_mult=(1, 2),
        num_heads=2, use_spatial_transformer=True, transformer_depth=1,
        context_dim=24, legacy=True)
    tenc = ref_vae.Encoder(ch=vcfg.ch, out_ch=vcfg.out_ch,
                           ch_mult=vcfg.ch_mult,
                           num_res_blocks=vcfg.num_res_blocks,
                           attn_resolutions=[], dropout=0.0,
                           in_channels=3, resolution=16,
                           z_channels=vcfg.z_channels, double_z=True)
    tdec = ref_vae.Decoder(ch=vcfg.ch, out_ch=vcfg.out_ch,
                           ch_mult=vcfg.ch_mult,
                           num_res_blocks=vcfg.num_res_blocks,
                           attn_resolutions=[], dropout=0.0,
                           in_channels=3, resolution=16,
                           z_channels=vcfg.z_channels, double_z=True)
    tq = torch.nn.Conv2d(2 * vcfg.z_channels, 2 * vcfg.embed_dim, 1)
    tpq = torch.nn.Conv2d(vcfg.embed_dim, vcfg.z_channels, 1)
    for m in (tunet, tenc, tdec):
        m.eval()

    ckpt = {}
    for k, v in tunet.state_dict().items():
        ckpt[f"model.diffusion_model.{k}"] = v.numpy()
    for prefix, m in (("encoder", tenc), ("decoder", tdec),
                      ("quant_conv", tq), ("post_quant_conv", tpq)):
        for k, v in m.state_dict().items():
            ckpt[f"first_stage_model.{prefix}.{k}"] = v.numpy()

    ldm = load_sd_checkpoint(ckpt, unet_config=ucfg, vae_config=vcfg,
                             text_encode=constant_context_encoder(24))

    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 8, 8).astype(np.float32)
    t = np.asarray([71.0], dtype=np.float32)
    ctx = rng.randn(1, 7, 24).astype(np.float32)
    with torch.no_grad():
        want = tunet(torch.from_numpy(x), torch.from_numpy(t),
                     context=torch.from_numpy(ctx)).numpy()
    got = ldm.apply_model(jnp.asarray(x.transpose(0, 2, 3, 1)),
                          jnp.asarray(t), jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=0, atol=3e-5)

    z = rng.randn(1, vcfg.z_channels, 8, 8).astype(np.float32)
    with torch.no_grad():
        want_dec = tdec(tpq(torch.from_numpy(z))).numpy()
    got_dec = ldm.decode_first_stage(
        jnp.asarray(z.transpose(0, 2, 3, 1)) * ldm.scale_factor)
    np.testing.assert_allclose(np.asarray(got_dec).transpose(0, 3, 1, 2),
                               want_dec, rtol=0, atol=3e-5)

    # The same converted checkpoint must drop into the int8 serving stack
    # (ops/quant.py) unchanged. The reference zero-initializes the UNet's
    # output conv (zero_module), so a fresh-init forward is identically 0 —
    # perturb the checkpoint to get a non-degenerate output, then compare
    # the quantized stack to the float stack on identical weights.
    prng = np.random.RandomState(7)
    ckpt_p = {k: v + 0.05 * prng.randn(*v.shape).astype(v.dtype)
              for k, v in ckpt.items()}
    kw = dict(unet_config=ucfg, vae_config=vcfg,
              text_encode=constant_context_encoder(24))
    ldm_p = load_sd_checkpoint(ckpt_p, **kw)
    ldm_q = load_sd_checkpoint(ckpt_p, quant="w8a8", **kw)
    xt = jnp.asarray(x.transpose(0, 2, 3, 1))
    got_p = np.asarray(ldm_p.apply_model(xt, jnp.asarray(t),
                                         jnp.asarray(ctx)))
    got_q = np.asarray(ldm_q.apply_model(xt, jnp.asarray(t),
                                         jnp.asarray(ctx)))
    assert np.mean(got_p ** 2) > 0
    rel = np.sqrt(np.mean((got_q - got_p) ** 2) / np.mean(got_p ** 2))
    assert rel < 0.1, rel

    # w8a8_conv reaches the VAE conv trunk through the loader too: the int8
    # decode must track the float decode to quantization noise.
    ldm_qc = load_sd_checkpoint(ckpt_p, quant="w8a8_conv", **kw)
    zl = jnp.asarray(z.transpose(0, 2, 3, 1)) * ldm_p.scale_factor
    dec_p = np.asarray(ldm_p.decode_first_stage(zl))
    dec_qc = np.asarray(ldm_qc.decode_first_stage(zl))
    assert np.all(np.isfinite(dec_qc))
    relv = np.sqrt(np.mean((dec_qc - dec_p) ** 2) / np.mean(dec_p ** 2))
    assert relv < 0.1, relv


def test_inpaint_end_to_end():
    """Masked resampling: the kept region is the original image exactly
    (pixel-space composite), the masked region is regenerated, and the
    output stays in [0,1]."""
    pipe = StableDiffusionPipeline(_tiny_ldm())
    rs = np.random.RandomState(0)
    init = jnp.asarray(rs.rand(1, 16, 16, 3).astype(np.float32) * 2 - 1)
    mask = np.zeros((1, 16, 16), np.float32)
    mask[:, 4:12, 4:12] = 1.0
    out = np.asarray(pipe.inpaint(init, mask, ["a cat"], steps=6,
                                  guidance_scale=3.0,
                                  rng=jax.random.PRNGKey(5)))
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(out).all() and out.min() >= 0.0 and out.max() <= 1.0
    orig = np.clip((np.asarray(init) + 1) / 2, 0, 1)
    keep = mask[..., None] == 0
    np.testing.assert_array_equal(out[np.broadcast_to(keep, out.shape)],
                                  orig[np.broadcast_to(keep, out.shape)])
    changed = np.abs(out - orig)[np.broadcast_to(~keep, out.shape)]
    assert changed.mean() > 1e-3  # the hole actually got regenerated


@requires_reference
def test_bert_embedder_matches_x_transformer():
    """Our BERTEmbedder (legacy LDM text encoder) must match the reference
    TransformerWrapper+Encoder with default settings
    (x_transformer.py:541-641) on converted weights."""
    import torch

    sd_dir = str(REFERENCE_ROOT / "examples" / "stable-diffusion")
    if sd_dir not in sys.path:
        sys.path.insert(0, sd_dir)
    from ldm.modules.x_transformer import Encoder, TransformerWrapper

    from dpm_solver_tpu.models.text_encoder import (
        BERTEmbedder,
        convert_bert_embedder,
    )

    dim, depth, vocab, seq = 64, 2, 100, 12
    torch.manual_seed(0)
    ref = TransformerWrapper(num_tokens=vocab, max_seq_len=seq,
                             attn_layers=Encoder(dim=dim, depth=depth))
    ref.eval()
    tokens = np.random.RandomState(0).randint(0, vocab, (3, seq))
    with torch.no_grad():
        want = ref(torch.from_numpy(tokens), return_embeddings=True).numpy()

    ours = BERTEmbedder(n_embed=dim, n_layer=depth, vocab_size=vocab,
                        max_seq_len=seq)
    params = convert_bert_embedder(
        {k: v.numpy() for k, v in ref.state_dict().items()}, depth)
    got = np.asarray(ours.apply(params, jnp.asarray(tokens)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_txt2img_sharded_matches_single_device():
    """txt2img over an 8-device mesh == the single-device result (the
    serving scale-out path: batch sharded, weights/cond replicated)."""
    from dpm_solver_tpu.parallel import make_mesh

    pipe = StableDiffusionPipeline(_tiny_ldm())
    prompts = [f"prompt {i}" for i in range(8)]
    rng = jax.random.PRNGKey(3)
    want = np.asarray(pipe.txt2img(prompts, steps=4, height=16, width=16,
                                   rng=rng))
    mesh = make_mesh()
    got = np.asarray(pipe.txt2img(prompts, steps=4, height=16, width=16,
                                  rng=rng, mesh=mesh))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)
