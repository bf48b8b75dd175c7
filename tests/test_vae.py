"""AutoencoderKL parity vs the reference LDM VAE (torch CPU oracle)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE_ROOT, requires_reference

from dpm_solver_tpu.models.vae import (
    AutoencoderKL,
    DiagonalGaussian,
    VAEConfig,
    convert_autoencoder_kl,
)

SD_DIR = str(REFERENCE_ROOT / "examples" / "stable-diffusion")


@pytest.fixture(scope="session")
def ref_vae_model():
    if SD_DIR not in sys.path:
        sys.path.insert(0, SD_DIR)
    from ldm.modules.diffusionmodules import model
    return model


def _ddconfig(cfg: VAEConfig):
    return dict(ch=cfg.ch, out_ch=cfg.out_ch, ch_mult=cfg.ch_mult,
                num_res_blocks=cfg.num_res_blocks,
                attn_resolutions=list(cfg.attn_resolutions),
                dropout=0.0, resamp_with_conv=cfg.resamp_with_conv,
                in_channels=cfg.in_channels, resolution=cfg.resolution,
                z_channels=cfg.z_channels, double_z=cfg.double_z)


@requires_reference
def test_autoencoder_kl_roundtrip_matches_torch(ref_vae_model):
    import torch

    cfg = VAEConfig.tiny()
    torch.manual_seed(0)
    enc = ref_vae_model.Encoder(**_ddconfig(cfg))
    dec = ref_vae_model.Decoder(**_ddconfig(cfg))
    quant = torch.nn.Conv2d(2 * cfg.z_channels, 2 * cfg.embed_dim, 1)
    post = torch.nn.Conv2d(cfg.embed_dim, cfg.z_channels, 1)
    for m in (enc, dec):
        m.eval()

    sd = {}
    for prefix, m in (("encoder", enc), ("decoder", dec),
                      ("quant_conv", quant), ("post_quant_conv", post)):
        for k, v in m.state_dict().items():
            sd[f"{prefix}.{k}" if k else prefix] = v.detach().numpy()

    params = convert_autoencoder_kl(sd, cfg)
    model = AutoencoderKL(config=cfg)

    rng = np.random.RandomState(0)
    x = rng.randn(2, cfg.in_channels, cfg.resolution,
                  cfg.resolution).astype(np.float32)

    with torch.no_grad():
        moments = quant(enc(torch.from_numpy(x)))
        mean, logvar = torch.chunk(moments, 2, dim=1)
        want_rec = dec(post(mean)).numpy()

    jx = jnp.asarray(x.transpose(0, 2, 3, 1))
    got_rec, posterior = model.apply(params, jx, sample_posterior=False)
    np.testing.assert_allclose(
        np.asarray(posterior.mean).transpose(0, 3, 1, 2), mean.numpy(),
        rtol=0, atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(got_rec).transpose(0, 3, 1, 2), want_rec,
        rtol=0, atol=3e-5)

    # encode/decode methods match __call__'s pieces
    post2 = model.apply(params, jx, method=AutoencoderKL.encode)
    np.testing.assert_allclose(np.asarray(post2.mean),
                               np.asarray(posterior.mean), rtol=0, atol=0)
    dec2 = model.apply(params, post2.mode(), method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(dec2), np.asarray(got_rec),
                               rtol=0, atol=1e-6)


@requires_reference
def test_diagonal_gaussian_stats_match_torch():
    import torch

    sys.path.insert(0, SD_DIR)
    from ldm.modules.distributions.distributions import (
        DiagonalGaussianDistribution,
    )

    rng = np.random.RandomState(1)
    moments = rng.randn(2, 8, 4, 4).astype(np.float32) * 3
    tref = DiagonalGaussianDistribution(torch.from_numpy(moments))
    mine = DiagonalGaussian.from_moments(
        jnp.asarray(moments.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(mine.kl()), tref.kl().numpy(),
                               rtol=1e-5, atol=1e-4)
    sample = rng.randn(2, 4, 4, 4).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(mine.nll(jnp.asarray(sample))),
        tref.nll(torch.from_numpy(sample.transpose(0, 3, 1, 2))).numpy(),
        rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mine.mode()).transpose(0, 3, 1, 2), tref.mode().numpy(),
        rtol=0, atol=0)


def test_vector_quantizer_properties():
    import jax

    from dpm_solver_tpu.models.vae import VectorQuantizer

    vq = VectorQuantizer(n_embed=16, embed_dim=4)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 3, 4))
    params = vq.init(jax.random.PRNGKey(1), z)
    z_q, loss, idx = vq.apply(params, z)
    codebook = np.asarray(params["params"]["embedding"])
    # every quantized vector is exactly a codebook row
    flat = np.asarray(z_q).reshape(-1, 4)
    ids = np.asarray(idx).reshape(-1)
    np.testing.assert_allclose(flat, codebook[ids], atol=1e-6)
    assert float(loss) > 0
    # straight-through: d z_q / d z == identity
    g = jax.grad(lambda zz: vq.apply(params, zz)[0].sum())(z)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)
    # quantizing a codebook row is a fixed point
    z_fix = jnp.broadcast_to(jnp.asarray(codebook[3]), (1, 1, 1, 4))
    zq2, _, idx2 = vq.apply(params, z_fix)
    assert int(np.asarray(idx2).ravel()[0]) == 3
    np.testing.assert_allclose(np.asarray(zq2), np.asarray(z_fix), atol=1e-6)


def test_vq_model_roundtrip_and_interface():
    import jax

    from dpm_solver_tpu.models.vae import VQModel

    cfg = VAEConfig.tiny(resolution=16, attn_resolutions=(), double_z=False,
                         z_channels=4, embed_dim=4)
    model = VQModel(config=cfg, n_embed=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    rec, loss, idx = model.apply(params, x)
    assert rec.shape == x.shape and np.isfinite(np.asarray(rec)).all()
    # VQModelInterface: encode gives PRE-quant h; decode quantizes by default
    h = model.apply(params, x, method=VQModel.encode)
    d1 = model.apply(params, h, method=VQModel.decode)
    d2 = model.apply(params, h, method=VQModel.decode, force_not_quantize=True)
    assert np.isfinite(np.asarray(d1)).all()
    assert float(np.abs(np.asarray(d1) - np.asarray(d2)).max()) > 0
