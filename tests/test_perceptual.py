"""LPIPS + PatchGAN first-stage loss stack vs torch-functional twins.

The reference's autoencoder losses (examples/stable-diffusion/ldm/modules/
losses/{contperceptual,vqperceptual}.py) build on `taming`'s LPIPS and
NLayerDiscriminator — external to the reference tree and absent in this
image — so the twins here are written directly with `torch.nn.functional`
(NCHW) from the published definitions, weights RANDOMIZED, and every
assembled loss value (including the adaptive GAN weight, which exercises
autograd-vs-jax.grad agreement) must match.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from dpm_solver_tpu.models.lpips import (  # noqa: E402
    _VGG_SLICES, LPIPS, convert_torch_lpips)
from dpm_solver_tpu.models.discriminator import (  # noqa: E402
    NLayerDiscriminator, convert_torch_discriminator)
from dpm_solver_tpu.training import perceptual as P  # noqa: E402

# ---------------------------------------------------------------- torch twins


def _random_lpips_sd(rng):
    sd = {}
    cin = 3
    for slice_convs in _VGG_SLICES:
        for idx, width in slice_convs:
            sd[f"features.{idx}.weight"] = rng.normal(
                0, 1.0 / np.sqrt(9 * cin), (width, cin, 3, 3)).astype(
                    np.float32)
            sd[f"features.{idx}.bias"] = rng.normal(
                0, 0.1, (width,)).astype(np.float32)
            cin = width
    for k, slice_convs in enumerate(_VGG_SLICES):
        width = slice_convs[-1][1]
        sd[f"lin{k}.model.1.weight"] = np.abs(rng.normal(
            0, 0.05, (1, width, 1, 1))).astype(np.float32)
    return sd


def _torch_lpips(x, y, sd):
    """x, y NCHW in [-1, 1]."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(t):
        t = (t - shift) / scale
        taps = []
        for si, slice_convs in enumerate(_VGG_SLICES):
            if si > 0:
                t = F.max_pool2d(t, 2, 2)
            for idx, _ in slice_convs:
                t = F.relu(F.conv2d(
                    t, torch.tensor(sd[f"features.{idx}.weight"]),
                    torch.tensor(sd[f"features.{idx}.bias"]), padding=1))
            taps.append(t)
        return taps

    def unit(t):
        return t / (t.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)

    total = 0.0
    for k, (a, b) in enumerate(zip(feats(x), feats(y))):
        d = (unit(a) - unit(b)) ** 2
        lw = torch.tensor(sd[f"lin{k}.model.1.weight"])
        total = total + F.conv2d(d, lw).mean([2, 3], keepdim=True)
    return total


def _random_disc_sd(rng, in_ch=3, ndf=8, n_layers=3):
    sd = {}
    cin = in_ch
    layout = [(0, ndf, True)]
    i = 2
    for n in range(1, n_layers + 1):
        layout.append((i, ndf * min(2 ** n, 8), False))
        i += 3
    layout.append((i, 1, True))
    for idx, (li, width, bias) in enumerate(layout):
        sd[f"main.{li}.weight"] = (0.02 * rng.standard_normal(
            (width, cin, 4, 4))).astype(np.float32)
        if bias:
            sd[f"main.{li}.bias"] = rng.normal(0, 0.1, (width,)).astype(
                np.float32)
        else:  # BatchNorm after this conv
            sd[f"main.{li + 1}.weight"] = (1.0 + 0.02 * rng.standard_normal(
                (width,))).astype(np.float32)
            sd[f"main.{li + 1}.bias"] = rng.normal(0, 0.05, (width,)).astype(
                np.float32)
            sd[f"main.{li + 1}.running_mean"] = np.zeros(width, np.float32)
            sd[f"main.{li + 1}.running_var"] = np.ones(width, np.float32)
        cin = width
    return sd


def _torch_disc(x, sd, n_layers=3):
    """Train-mode (batch-stat) PatchGAN forward, NCHW."""
    t = F.conv2d(x, torch.tensor(sd["main.0.weight"]),
                 torch.tensor(sd["main.0.bias"]), stride=2, padding=1)
    t = F.leaky_relu(t, 0.2)
    i = 2
    for n in range(1, n_layers + 1):
        stride = 2 if n < n_layers else 1
        t = F.conv2d(t, torch.tensor(sd[f"main.{i}.weight"]), None,
                     stride=stride, padding=1)
        rm = torch.tensor(sd[f"main.{i + 1}.running_mean"]).clone()
        rv = torch.tensor(sd[f"main.{i + 1}.running_var"]).clone()
        t = F.batch_norm(t, rm, rv,
                         torch.tensor(sd[f"main.{i + 1}.weight"]),
                         torch.tensor(sd[f"main.{i + 1}.bias"]),
                         training=True, eps=1e-5)
        t = F.leaky_relu(t, 0.2)
        i += 3
    return F.conv2d(t, torch.tensor(sd[f"main.{i}.weight"]),
                    torch.tensor(sd[f"main.{i}.bias"]), stride=1, padding=1)


# -------------------------------------------------------------------- tests


def test_lpips_matches_torch():
    rng = np.random.default_rng(0)
    sd = _random_lpips_sd(rng)
    x = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)

    want = _torch_lpips(torch.tensor(x), torch.tensor(y), sd).numpy()

    model = LPIPS()
    params = convert_torch_lpips(sd)
    got = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      jnp.asarray(y.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got)[:, 0, 0, 0],
                               want[:, 0, 0, 0], rtol=2e-4, atol=2e-5)


def test_lpips_zero_on_identical_inputs():
    rng = np.random.default_rng(1)
    sd = _random_lpips_sd(rng)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32))
    got = LPIPS().apply(convert_torch_lpips(sd), x, x)
    np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-7)


def test_discriminator_matches_torch():
    rng = np.random.default_rng(2)
    sd = _random_disc_sd(rng, ndf=8)
    x = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)

    want = _torch_disc(torch.tensor(x), sd).numpy()

    disc = NLayerDiscriminator(ndf=8)
    dvars = convert_torch_discriminator(sd)
    got, _ = disc.apply(dvars, jnp.asarray(x.transpose(0, 2, 3, 1)),
                        mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got)[..., 0],
                               want[:, 0], rtol=2e-4, atol=2e-4)


def test_d_losses_match_torch_formulas():
    rng = np.random.default_rng(3)
    lr = rng.normal(0, 1, (2, 1, 5, 5)).astype(np.float32)
    lf = rng.normal(0, 1, (2, 1, 5, 5)).astype(np.float32)
    want_h = 0.5 * (F.relu(1.0 - torch.tensor(lr)).mean()
                    + F.relu(1.0 + torch.tensor(lf)).mean())
    want_v = 0.5 * (F.softplus(-torch.tensor(lr)).mean()
                    + F.softplus(torch.tensor(lf)).mean())
    np.testing.assert_allclose(
        float(P.hinge_d_loss(jnp.asarray(lr), jnp.asarray(lf))),
        float(want_h), rtol=1e-6)
    np.testing.assert_allclose(
        float(P.vanilla_d_loss(jnp.asarray(lr), jnp.asarray(lf))),
        float(want_v), rtol=1e-6)
    w = np.abs(rng.normal(1, 0.3, (2,))).astype(np.float32)
    want_w = (0.5 * ((torch.tensor(w) * F.relu(1.0 - torch.tensor(lr))
                      .mean(dim=[1, 2, 3])).sum() / torch.tensor(w).sum()
                     + (torch.tensor(w) * F.relu(1.0 + torch.tensor(lf))
                        .mean(dim=[1, 2, 3])).sum() / torch.tensor(w).sum()))
    np.testing.assert_allclose(
        float(P.hinge_d_loss_with_exemplar_weights(
            jnp.asarray(lr), jnp.asarray(lf), jnp.asarray(w))),
        float(want_w), rtol=1e-6)


def test_adopt_weight_traced_step():
    assert float(P.adopt_weight(0.7, jnp.int32(9), threshold=10)) == 0.0
    assert float(P.adopt_weight(0.7, jnp.int32(10), threshold=10)) == \
        pytest.approx(0.7)


def test_measure_perplexity_uniform():
    idx = jnp.arange(16) % 4
    perp, used = P.measure_perplexity(idx, 4)
    np.testing.assert_allclose(float(perp), 4.0, rtol=1e-5)
    assert int(used) == 4


def test_kl_generator_loss_matches_torch_assembly():
    """Full optimizer-0 LPIPSWithDiscriminator value incl. adaptive weight
    (contperceptual.py:45-92), vs a torch twin with the same nets."""
    rng = np.random.default_rng(4)
    lpips_sd = _random_lpips_sd(rng)
    disc_sd = _random_disc_sd(rng, ndf=8)
    B, H, C = 2, 32, 3
    inputs = rng.uniform(-1, 1, (B, H, H, C)).astype(np.float32)
    trunk = rng.normal(0, 0.5, (B, H, H, 8)).astype(np.float32)
    w_last = rng.normal(0, 0.1, (3, 3, 8, C)).astype(np.float32)
    b_last = rng.normal(0, 0.05, (C,)).astype(np.float32)
    mean = rng.normal(0, 1, (B, 4, 4, 4)).astype(np.float32)
    logvar_post = rng.normal(0, 0.3, (B, 4, 4, 4)).astype(np.float32)
    logvar = 0.13
    kl_weight, disc_weight, global_step = 0.5, 0.8, 100

    # ---- torch twin
    tw = torch.tensor(w_last.transpose(3, 2, 0, 1), requires_grad=True)
    trec = F.conv2d(torch.tensor(trunk.transpose(0, 3, 1, 2)), tw,
                    torch.tensor(b_last), padding=1)
    tin = torch.tensor(inputs.transpose(0, 3, 1, 2))
    rec_loss = (tin - trec).abs() + _torch_lpips(tin, trec, lpips_sd)
    nll = rec_loss / np.exp(logvar) + logvar
    nll = nll.sum() / B
    tkl = 0.5 * (torch.tensor(mean) ** 2
                 + torch.tensor(logvar_post).exp() - 1.0
                 - torch.tensor(logvar_post)).sum() / B
    g_loss = -_torch_disc(trec, disc_sd).mean()
    nll_g = torch.autograd.grad(nll, tw, retain_graph=True)[0]
    g_g = torch.autograd.grad(g_loss, tw, retain_graph=True)[0]
    d_weight = (nll_g.norm() / (g_g.norm() + 1e-4)).clamp(0, 1e4) \
        * disc_weight
    want = (nll + kl_weight * tkl + d_weight * 1.0 * g_loss).item()

    # ---- ours
    from dpm_solver_tpu.models.vae import DiagonalGaussian
    from dpm_solver_tpu.ops.conv3x3 import conv3x3

    lp = LPIPS()
    lp_params = convert_torch_lpips(lpips_sd)
    disc = NLayerDiscriminator(ndf=8)
    dvars = convert_torch_discriminator(disc_sd)

    def pfn(x, y):
        return lp.apply(lp_params, x, y)

    def dfn(x):
        logits, _ = disc.apply(dvars, x, mutable=["batch_stats"])
        return logits

    cfg = P.KLLossConfig(disc_start=50, kl_weight=kl_weight,
                         disc_weight=disc_weight)
    kernel = jnp.asarray(w_last)
    recon = conv3x3(jnp.asarray(trunk), kernel, jnp.asarray(b_last))
    out = P.kl_generator_loss(
        cfg, pfn, dfn, jnp.asarray(inputs), recon,
        DiagonalGaussian(jnp.asarray(mean), jnp.asarray(logvar_post)),
        jnp.float32(logvar), jnp.int32(global_step),
        last_layer_fn=lambda w: conv3x3(jnp.asarray(trunk), w,
                                        jnp.asarray(b_last)),
        last_layer_params=kernel)
    np.testing.assert_allclose(float(out.loss), want, rtol=5e-4)
    np.testing.assert_allclose(float(out.log["d_weight"]),
                               float(d_weight), rtol=5e-4)
    # before disc_start the adversarial term is gated off
    out0 = P.kl_generator_loss(
        cfg, pfn, dfn, jnp.asarray(inputs), recon,
        DiagonalGaussian(jnp.asarray(mean), jnp.asarray(logvar_post)),
        jnp.float32(logvar), jnp.int32(10),
        last_layer_fn=lambda w: conv3x3(jnp.asarray(trunk), w,
                                        jnp.asarray(b_last)),
        last_layer_params=kernel)
    want0 = (nll + kl_weight * tkl).item()
    np.testing.assert_allclose(float(out0.loss), want0, rtol=5e-4)


def test_discriminator_loss_matches_torch():
    rng = np.random.default_rng(5)
    disc_sd = _random_disc_sd(rng, ndf=8)
    inputs = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    recon = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)

    tr = _torch_disc(torch.tensor(inputs.transpose(0, 3, 1, 2)), disc_sd)
    tf = _torch_disc(torch.tensor(recon.transpose(0, 3, 1, 2)), disc_sd)
    want = 0.5 * (F.relu(1.0 - tr).mean() + F.relu(1.0 + tf).mean())

    disc = NLayerDiscriminator(ndf=8)
    dvars = convert_torch_discriminator(disc_sd)

    def dfn(x):
        logits, _ = disc.apply(dvars, x, mutable=["batch_stats"])
        return logits

    cfg = P.KLLossConfig(disc_start=0)
    out = P.discriminator_loss(cfg, dfn, jnp.asarray(inputs),
                               jnp.asarray(recon), jnp.int32(5))
    np.testing.assert_allclose(float(out.loss), float(want), rtol=2e-4)


def test_actnorm_matches_taming_semantics():
    """taming ActNorm: scale * (x + loc); lazy init loc=-mean,
    scale=1/(std+eps)."""
    from dpm_solver_tpu.models.discriminator import (
        ActNorm, actnorm_stats_from_batch)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(2.0, 3.0, (4, 5, 5, 6)).astype(np.float32))
    an = ActNorm()
    params = an.init(jax.random.PRNGKey(0), x)
    loc, scale = actnorm_stats_from_batch(x)
    params = {"params": {"loc": loc, "scale": scale}}
    out = an.apply(params, x)
    # initialized output is per-channel standardized (torch Tensor.std is
    # Bessel-corrected, so the unit-variance claim is the ddof=1 one)
    np.testing.assert_allclose(np.asarray(out.mean(axis=(0, 1, 2))), 0.0,
                               atol=1e-5)
    np.testing.assert_allclose(
        np.std(np.asarray(out), axis=(0, 1, 2), ddof=1), 1.0, atol=1e-3)


def test_actnorm_discriminator_converter():
    """ActNorm checkpoints store main.{i}.loc/scale (1,C,1,1); converter
    must route them and the forward must match a torch twin."""
    from dpm_solver_tpu.models.discriminator import (
        NLayerDiscriminator, convert_torch_discriminator)

    rng = np.random.default_rng(8)
    ndf, n_layers = 8, 2
    sd = {}
    cin = 3
    layout = [(0, ndf, True)]
    i = 2
    for n in range(1, n_layers + 1):
        layout.append((i, ndf * min(2 ** n, 8), False))
        i += 3
    layout.append((i, 1, True))
    for li, width, bias in layout:
        sd[f"main.{li}.weight"] = (0.02 * rng.standard_normal(
            (width, cin, 4, 4))).astype(np.float32)
        # ActNorm discriminators keep conv biases (use_bias=True)
        sd[f"main.{li}.bias"] = rng.normal(0, 0.1, (width,)).astype(
            np.float32)
        if not bias:
            sd[f"main.{li + 1}.loc"] = rng.normal(
                0, 0.5, (1, width, 1, 1)).astype(np.float32)
            sd[f"main.{li + 1}.scale"] = np.abs(rng.normal(
                1, 0.2, (1, width, 1, 1))).astype(np.float32)
        cin = width
    x = rng.uniform(-1, 1, (2, 3, 16, 16)).astype(np.float32)

    t = F.conv2d(torch.tensor(x), torch.tensor(sd["main.0.weight"]),
                 torch.tensor(sd["main.0.bias"]), stride=2, padding=1)
    t = F.leaky_relu(t, 0.2)
    i = 2
    for n in range(1, n_layers + 1):
        stride = 2 if n < n_layers else 1
        t = F.conv2d(t, torch.tensor(sd[f"main.{i}.weight"]),
                     torch.tensor(sd[f"main.{i}.bias"]), stride=stride,
                     padding=1)
        t = torch.tensor(sd[f"main.{i + 1}.scale"]) * (
            t + torch.tensor(sd[f"main.{i + 1}.loc"]))
        t = F.leaky_relu(t, 0.2)
        i += 3
    want = F.conv2d(t, torch.tensor(sd[f"main.{i}.weight"]),
                    torch.tensor(sd[f"main.{i}.bias"]), stride=1,
                    padding=1).numpy()

    disc = NLayerDiscriminator(ndf=ndf, n_layers=n_layers,
                               use_actnorm=True)
    dvars = convert_torch_discriminator(sd, n_layers=n_layers)
    got = disc.apply(dvars, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got)[..., 0], want[:, 0],
                               rtol=2e-4, atol=2e-4)
