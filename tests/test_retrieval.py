"""Retrieval-augmented generation (knn2img / RDM) tests.

Mirrors scripts/knn2img.py semantics: exact brute-force top-k over
normalized CLIP-space embeddings (the reference's scann config is
``score_brute_force`` too), conditioning = [text ; k neighbours], CFG
unconditional branch = zeros (knn2img.py:363), npz database format.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpm_solver_tpu.models.adm_unet import ADMConfig, ADMUNet
from dpm_solver_tpu.models.vae import AutoencoderKL, VAEConfig
from dpm_solver_tpu.pipelines import LatentDiffusion, Searcher, knn2img
from dpm_solver_tpu.pipelines.retrieval import build_image_database

D = 12  # tiny joint-embedding dim


def _db(n=64, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "embedding": rng.standard_normal((n, D)).astype(np.float32),
        "img_id": np.arange(n),
        "patch_coords": rng.integers(0, 100, (n, 4)).astype(np.int32),
    }


def _stub_text_embedder(prompts):
    """Deterministic joint-space stub: hash prompt -> unit vector (B,1,D)."""
    rows = []
    for p in prompts:
        h = abs(hash(("stub", p))) % (2 ** 31)
        v = np.random.RandomState(h).randn(D).astype(np.float32)
        rows.append(v / np.linalg.norm(v))
    return jnp.asarray(np.stack(rows))[:, None, :]


def test_searcher_matches_numpy_brute_force():
    db = _db()
    s = Searcher(db)
    q = np.random.default_rng(1).standard_normal((5, D)).astype(np.float32)
    out = s.search(q, k=7)
    # oracle: normalized dot-product argsort
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    dbn = db["embedding"] / np.linalg.norm(db["embedding"], axis=1,
                                           keepdims=True)
    want = np.argsort(-(qn @ dbn.T), axis=1)[:, :7]
    np.testing.assert_array_equal(out["nns"], want)
    assert out["nn_embeddings"].shape == (5, 7, D)
    np.testing.assert_allclose(
        np.linalg.norm(out["nn_embeddings"], axis=-1), 1.0, atol=1e-5)
    np.testing.assert_array_equal(out["img_ids"], db["img_id"][want])
    assert out["patch_coords"].shape == (5, 7, 4)


def test_searcher_query_conventions():
    s = Searcher(_db())
    q3 = np.random.default_rng(2).standard_normal((2, 3, D)).astype(np.float32)
    out = s.search(q3, k=4)  # 3-D conditioning: first token is the query
    out2 = s.search(q3[:, 0], k=4)
    np.testing.assert_array_equal(out["nns"], out2["nns"])
    # k larger than the database clamps instead of failing
    assert s.search(q3, k=10_000)["nns"].shape == (2, len(s))


def test_searcher_npz_loading(tmp_path):
    db = _db()
    np.savez(tmp_path / "part1.npz", **{k: v[:40] for k, v in db.items()})
    np.savez(tmp_path / "part2.npz", **{k: v[40:] for k, v in db.items()})
    s_dir = Searcher(str(tmp_path))
    s_mem = Searcher(db)
    assert len(s_dir) == len(s_mem) == 64
    q = np.random.default_rng(3).standard_normal((1, D)).astype(np.float32)
    np.testing.assert_array_equal(s_dir.search(q, 5)["nns"],
                                  s_mem.search(q, 5)["nns"])


def _tiny_rdm(context_dim=D, z_channels=6):
    """Tiny RDM-shaped bundle: crossattn UNet over z_channels latents +
    an f4 KL first stage."""
    ucfg = ADMConfig(image_size=8, in_channels=z_channels, model_channels=32,
                     out_channels=z_channels, num_res_blocks=1,
                     attention_resolutions=(1, 2), channel_mult=(1, 2),
                     num_heads=2, use_spatial_transformer=True,
                     transformer_depth=1, context_dim=context_dim)
    vcfg = VAEConfig.tiny(resolution=16, attn_resolutions=(),
                          z_channels=z_channels, embed_dim=z_channels)
    unet, vae = ADMUNet(config=ucfg), AutoencoderKL(config=vcfg)
    k = jax.random.PRNGKey(0)
    up = unet.init(k, jnp.zeros((1, 8, 8, z_channels)), jnp.ones((1,)), None,
                   jnp.zeros((1, 5, context_dim)), deterministic=True)
    # jitter the zero-initialized projections (SpatialTransformer proj_out
    # is zero_module'd like the reference) so conditioning visibly flows
    # through random-init nets
    leaves, treedef = jax.tree.flatten(up)
    up = jax.tree.unflatten(treedef, [
        l + 0.02 * jax.random.normal(jax.random.PRNGKey(i), l.shape, l.dtype)
        for i, l in enumerate(leaves)])
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)))
    return LatentDiffusion(unet=unet, unet_params=up, vae=vae, vae_params=vp)


def test_knn2img_end_to_end():
    model = _tiny_rdm()
    searcher = Searcher(_db())
    img, info = knn2img(
        model, ["a surrealist landscape", "a baroque portrait"],
        text_embedder=_stub_text_embedder, searcher=searcher, knn=4,
        steps=5, guidance_scale=5.0, height=16, width=16,
        rng=jax.random.PRNGKey(7), return_nn_info=True)
    img = np.asarray(img)
    assert img.shape == (2, 16, 16, 3)
    assert np.isfinite(img).all() and img.min() >= 0.0 and img.max() <= 1.0
    # conditioning was [text ; 4 neighbours]
    assert info["nn_embeddings"].shape == (2, 4, D)

    # neighbours must CHANGE the sample (conditioning actually flows)
    img_noknn = np.asarray(knn2img(
        model, ["a surrealist landscape", "a baroque portrait"],
        text_embedder=_stub_text_embedder, searcher=None, knn=0,
        steps=5, guidance_scale=5.0, height=16, width=16,
        rng=jax.random.PRNGKey(7)))
    assert np.abs(img - img_noknn).max() > 1e-4


def test_knn2img_scale_one_skips_uncond():
    """guidance_scale=1 -> no CFG double batch (uc=None path)."""
    model = _tiny_rdm()
    img = np.asarray(knn2img(
        model, ["x"], text_embedder=_stub_text_embedder, searcher=None,
        steps=4, guidance_scale=1.0, height=16, width=16,
        rng=jax.random.PRNGKey(1)))
    assert img.shape == (1, 16, 16, 3) and np.isfinite(img).all()


def test_build_image_database(tmp_path):
    """Database building with an injected embedder, saved in reference npz
    format, loadable by Searcher."""

    def fake_image_embedder(batch):
        # any callable image -> (B, D); here: pooled pixels projected
        flat = batch.reshape(batch.shape[0], -1)
        proj = jnp.asarray(
            np.random.RandomState(0).randn(flat.shape[1], D), jnp.float32)
        return flat @ proj

    imgs = np.random.default_rng(5).uniform(-1, 1, (10, 8, 8, 3)) \
        .astype(np.float32)
    path = str(tmp_path / "db" / "embeddings.npz")
    db = build_image_database(imgs, fake_image_embedder, batch_size=4,
                              save_path=path)
    assert db["embedding"].shape == (10, D)
    s = Searcher(path)
    assert len(s) == 10
    out = s.search(db["embedding"][:2], k=1)
    # each embedding's own nearest neighbour is itself
    np.testing.assert_array_equal(out["nns"][:, 0], [0, 1])


def test_rdm_config_presets():
    """The 768x768.yaml constants round-trip through our presets."""
    u = ADMConfig.rdm_768()
    assert (u.in_channels, u.out_channels, u.model_channels) == (16, 16, 448)
    assert u.context_dim == 768 and u.use_spatial_transformer
    v = VAEConfig.rdm_768()
    assert v.z_channels == 16 and len(v.ch_mult) == 5  # f16 first stage


def test_spatial_rescaler():
    """Layout-conditioning rescaler (modules.py:106-135): n stages of 0.5x +
    1x1 remap."""
    from dpm_solver_tpu.models import SpatialRescaler

    m = SpatialRescaler(n_stages=2, out_channels=5)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    y = m.apply(p, jnp.ones((2, 32, 32, 3)))
    assert y.shape == (2, 8, 8, 5)
    # no remap -> channels preserved, pure resize
    m2 = SpatialRescaler(n_stages=1)
    y2 = m2.apply(m2.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 4))),
                  jnp.ones((2, 8, 8, 4)))
    assert y2.shape == (2, 4, 4, 4)
    import numpy as np
    np.testing.assert_allclose(np.asarray(y2), 1.0, atol=1e-6)


def test_searcher_rejects_mismatched_shards(tmp_path):
    np.savez(tmp_path / "a.npz", embedding=np.zeros((4, D), np.float32),
             img_id=np.arange(4))
    np.savez(tmp_path / "b.npz", embedding=np.zeros((4, D), np.float32))
    with pytest.raises(ValueError, match="carries keys"):
        Searcher(str(tmp_path))


def test_ldm_presets_table():
    from dpm_solver_tpu.pipelines.stable_diffusion import _LDM_PRESETS

    u, v, bkw, scale = _LDM_PRESETS["cin256"]
    assert v().double_z is False and v().z_channels == 3  # VQ-f4
    assert u().context_dim == 512 and u().model_channels == 192
    assert bkw == dict(linear_start=0.0015, linear_end=0.0195)
    assert scale == 1.0
    assert _LDM_PRESETS["rdm_768"][3] == 0.22765929


def test_latent_diffusion_vq_first_stage():
    """VQ bundles route encode/decode through VQModel (decode QUANTIZES by
    default per VQModelInterface), not AutoencoderKL's methods."""
    from dpm_solver_tpu.models.vae import VQModel, VAEConfig

    cfg = VAEConfig.tiny(resolution=16, attn_resolutions=(), double_z=False,
                         z_channels=3, embed_dim=3)
    vq = VQModel(config=cfg, n_embed=16)
    vp = vq.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    model = _tiny_rdm(z_channels=3)
    import dataclasses

    model = dataclasses.replace(model, vae=vq, vae_params=vp,
                                scale_factor=1.0)
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3),
                             minval=-1.0, maxval=1.0)
    z = model.encode_first_stage(img)
    assert z.shape == (2, 8, 8, 3)
    dec = model.decode_first_stage(z)
    assert dec.shape == (2, 16, 16, 3)
    # decode quantized: equals decoding the codebook-snapped latent
    snapped, _, _ = vq.apply(vp, z, method=lambda m, h: m.quantize(h))
    dec2 = vq.apply(vp, snapped, method=VQModel.decode,
                    force_not_quantize=True)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(dec2),
                               rtol=1e-5, atol=1e-5)
