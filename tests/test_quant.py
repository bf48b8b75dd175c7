"""Int8 W8A8 dynamic-quantization serving path (ops/quant.py).

No reference counterpart (the reference's serving precision story is fp16
autocast, examples/stable-diffusion/scripts/txt2img.py:254,289); tests pin
the quantized matmul against exact integer cases, bound the quantization
noise statistically, and prove the param tree / checkpoint compatibility
claim on the SD transformer stack.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpm_solver_tpu.ops.quant import (QuantDense, dense, quantize,
                                      w8a8_geglu, w8a8_matmul)


def test_w8a8_matmul_exact_on_representable_inputs():
    """Rows/columns whose absmax is exactly 127 quantize losslessly, so the
    int8 path must reproduce the fp32 matmul bit-for-bit (catches any
    scale/transpose/accumulation wiring bug deterministically)."""
    rng = np.random.default_rng(0)
    x = rng.integers(-127, 128, size=(16, 64)).astype(np.float32)
    w = rng.integers(-127, 128, size=(64, 32)).astype(np.float32)
    x[:, 0] = 127  # pin every row scale to exactly 1
    w[0, :] = -127  # pin every column scale to exactly 1
    bias = rng.standard_normal(32).astype(np.float32)
    got = np.asarray(w8a8_matmul(jnp.asarray(x), jnp.asarray(w),
                                 jnp.asarray(bias)))
    want = x @ w + bias
    np.testing.assert_array_equal(got, want)


def test_w8a8_matmul_noise_bound():
    """Per-token/per-channel absmax scales bound relative RMSE to ~1.3% on
    gaussian operands (analytic: sqrt(2) * (amax/127/sigma) / sqrt(12))."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((128, 256)).astype(np.float32)
    w = (rng.standard_normal((256, 192)) * 0.05).astype(np.float32)
    got = np.asarray(w8a8_matmul(jnp.asarray(x), jnp.asarray(w)))
    want = x @ w
    rel = np.sqrt(np.mean((got - want) ** 2) / np.mean(want ** 2))
    assert rel < 0.03, rel


def test_w8a8_matmul_zero_rows_and_dtype():
    x = jnp.zeros((4, 32), jnp.bfloat16)
    w = jnp.asarray(np.random.default_rng(2).standard_normal((32, 8)),
                    jnp.float32)
    out = w8a8_matmul(x, w)
    assert out.dtype == jnp.bfloat16
    assert np.all(np.asarray(out) == 0)


def test_quantize_range():
    q, s = quantize(jnp.asarray(np.random.default_rng(3)
                                .standard_normal((8, 16)) * 10), axis=1)
    assert q.dtype == jnp.int8
    assert int(jnp.max(jnp.abs(q))) == 127


def test_w8a8_geglu_matches_float_path():
    from dpm_solver_tpu.ops.geglu import geglu_ff

    rng = np.random.default_rng(4)
    m, d, inner = 32, 48, 96
    x = jnp.asarray(rng.standard_normal((m, d)) * 0.3, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, 2 * inner)) * d ** -0.5)
    b1 = jnp.asarray(rng.standard_normal(2 * inner) * 0.01)
    w2 = jnp.asarray(rng.standard_normal((inner, d)) * inner ** -0.5)
    b2 = jnp.asarray(rng.standard_normal(d) * 0.01)
    got = np.asarray(w8a8_geglu(x, w1, b1, w2, b2))
    want = np.asarray(geglu_ff(x, w1, b1, w2, b2))
    rel = np.sqrt(np.mean((got - want) ** 2) / np.mean(want ** 2))
    assert rel < 0.05, rel


def test_w8a8_conv_exact_on_representable_inputs():
    """Per-image/per-channel scales pinned to 1 by +/-127 entries: the int8
    conv must equal the fp32 conv exactly (wiring/layout check)."""
    from dpm_solver_tpu.ops.quant import w8a8_conv

    rng = np.random.default_rng(6)
    x = rng.integers(-127, 128, size=(2, 8, 8, 16)).astype(np.float32)
    w = rng.integers(-127, 128, size=(3, 3, 16, 24)).astype(np.float32)
    x[:, 0, 0, 0] = 127
    w[0, 0, 0, :] = 127
    b = rng.standard_normal(24).astype(np.float32)
    got = np.asarray(w8a8_conv(jnp.asarray(x), jnp.asarray(w),
                               jnp.asarray(b)))
    want = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))) + b
    np.testing.assert_array_equal(got, want)


def test_w8a8_conv_zero_kernel_exact():
    """A zero-initialized kernel (the reference's zero_module residual
    gates) must stay bit-exact through quantization."""
    from dpm_solver_tpu.ops.quant import w8a8_conv

    x = jnp.asarray(np.random.default_rng(7).standard_normal((1, 4, 4, 8)),
                    jnp.float32)
    w = jnp.zeros((3, 3, 8, 8), jnp.float32)
    assert np.all(np.asarray(w8a8_conv(x, w)) == 0)


def test_quant_dense_param_tree_matches_nn_dense():
    import flax.linen as nn

    x = jnp.ones((2, 16))
    p_q = QuantDense(8, name="d").init(jax.random.PRNGKey(0), x)
    p_f = nn.Dense(8, name="d").init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p_q) == jax.tree_util.tree_structure(p_f)
    for a, b in zip(jax.tree_util.tree_leaves(p_q),
                    jax.tree_util.tree_leaves(p_f)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dense_factory_zero_init_stays_float():
    import flax.linen as nn

    mod = dense("w8a8", 4, name="z", kernel_init=jax.nn.initializers.zeros)
    assert isinstance(mod, nn.Dense) and not isinstance(mod, QuantDense)
    with pytest.raises(ValueError):
        dense("int4", 4, name="bad")


def _spatial_transformer_pair(quant, linear_proj=True, seed=0):
    from dpm_solver_tpu.models.transformer import SpatialTransformer

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)) * 0.5, jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 7, 24)) * 0.5, jnp.float32)
    kw = dict(heads=2, dim_head=16, depth=1, linear_proj=linear_proj)
    m_f = SpatialTransformer(**kw)
    m_q = SpatialTransformer(quant=quant, **kw)
    params = _densify(m_f.init(jax.random.PRNGKey(1), x, ctx))
    return m_f, m_q, params, x, ctx


def _densify(params, scale=0.05, seed=9):
    """Additive noise on every leaf: zero-initialized output projections
    (residual gates) would otherwise make the float output identically x."""
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(rng.standard_normal(a.shape) * scale,
                                  a.dtype), params)


def test_spatial_transformer_quant_shares_checkpoints():
    """The quantized stack must accept the float stack's params unchanged
    (the 'converters and checkpoints untouched' claim), and its output must
    track the float output to quantization noise."""
    m_f, m_q, params, x, ctx = _spatial_transformer_pair("w8a8")
    p_q = m_q.init(jax.random.PRNGKey(2), x, ctx)
    assert (jax.tree_util.tree_structure(p_q)
            == jax.tree_util.tree_structure(params))
    out_f = np.asarray(m_f.apply(params, x, ctx))
    out_q = np.asarray(m_q.apply(params, x, ctx))  # float params, quant stack
    # compare the transformer's contribution (module is residual: out = x + h)
    h_f, h_q = out_f - np.asarray(x), out_q - np.asarray(x)
    rel = np.sqrt(np.mean((h_q - h_f) ** 2) / np.mean(h_f ** 2))
    assert rel < 0.15, rel
    assert np.all(np.isfinite(out_q))


def test_quant_sampler_sharded_matches_single_device():
    """The int8 path under data-parallel GSPMD sharding on the 8-device CPU
    mesh: all quantization scales are per-sample, so batch sharding changes
    no math. Unlike the float sampler (1e-4-tight), tolerance here is the
    quantization-flip scale: a differently-fused compilation can move an
    activation across an int8 rounding boundary, flipping one level
    (~amax/127 locally, measured 1.1e-3 at signal scale over 5 steps)."""
    from dpm_solver_tpu import NoiseScheduleVP, build_sampler, model_wrapper
    from dpm_solver_tpu.models.adm_unet import ADMConfig, ADMUNet
    from dpm_solver_tpu.parallel import make_mesh, make_sharded_sampler

    cfg = ADMConfig(image_size=8, in_channels=3, model_channels=32,
                    out_channels=3, num_res_blocks=1,
                    attention_resolutions=(2,), channel_mult=(1, 2),
                    num_heads=2, use_spatial_transformer=True,
                    transformer_depth=1, context_dim=24,
                    use_linear_in_transformer=True, quant="w8a8_conv")
    model = ADMUNet(config=cfg)
    rng = np.random.default_rng(11)
    ctx = jnp.asarray(rng.standard_normal((8, 7, 24)) * 0.3, jnp.float32)
    params = _densify(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,)),
        context=ctx[:1]), scale=0.02)
    ns = NoiseScheduleVP.discrete(
        betas=jnp.asarray(np.linspace(1e-4, 2e-2, 1000)))
    model_fn = model_wrapper(
        lambda x, t: model.apply(params, x, t, context=ctx), ns,
        model_type="noise")
    fn = build_sampler(model_fn, ns, steps=5, order=2, method="multistep")
    x_T = rng.standard_normal((8, 8, 8, 3)).astype(np.float32)

    single = np.asarray(jax.jit(fn)(jnp.asarray(x_T)))
    mesh = make_mesh(jax.devices()[:8])
    sharded = np.asarray(make_sharded_sampler(fn, mesh)(jnp.asarray(x_T)))
    scale = max(1.0, np.abs(single).max())
    np.testing.assert_allclose(sharded / scale, single / scale,
                               rtol=0, atol=5e-3)
    assert np.all(np.isfinite(single))


def test_vae_decoder_quant_shares_checkpoints():
    """AutoencoderKL with quant='w8a8_conv': res-block/upsample convs run
    int8, conv_in/conv_out + attention stay float, param tree unchanged, and
    the decode output tracks the float decode to quantization noise."""
    from dpm_solver_tpu.models.vae import AutoencoderKL, VAEConfig

    cfg_f = VAEConfig.tiny()
    cfg_q = dataclasses.replace(cfg_f, quant="w8a8_conv")
    vae_f, vae_q = AutoencoderKL(config=cfg_f), AutoencoderKL(config=cfg_q)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)) * 0.5, jnp.float32)
    params = _densify(vae_f.init(jax.random.PRNGKey(0), x), scale=0.02)
    p_q = vae_q.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(p_q)
            == jax.tree_util.tree_structure(params))
    z = jnp.asarray(rng.standard_normal((2, 16, 16, 4)), jnp.float32)
    dec_f = np.asarray(vae_f.apply(params, z, method="decode"))
    dec_q = np.asarray(vae_q.apply(params, z, method="decode"))
    assert np.all(np.isfinite(dec_q))
    rel = np.sqrt(np.mean((dec_q - dec_f) ** 2) / np.mean(dec_f ** 2))
    assert rel < 0.1, rel


@pytest.mark.parametrize("mode", ["w8a8", "w8a8_conv"])
def test_sd_unet_quant_forward(mode):
    """Tiny SD-style UNet end to end with config.quant: same param tree as
    the float config, close output, finite."""
    from dpm_solver_tpu.models.adm_unet import ADMConfig, ADMUNet

    base = dict(image_size=8, in_channels=4, model_channels=32,
                out_channels=4, num_res_blocks=1,
                attention_resolutions=(1, 2), channel_mult=(1, 2),
                num_heads=2, use_spatial_transformer=True,
                transformer_depth=1, context_dim=24,
                use_linear_in_transformer=True)
    cfg_f = ADMConfig(**base)
    cfg_q = dataclasses.replace(cfg_f, quant=mode)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([3.0, 500.0])
    ctx = jnp.asarray(rng.standard_normal((2, 7, 24)), jnp.float32)
    net_f, net_q = ADMUNet(config=cfg_f), ADMUNet(config=cfg_q)
    params = _densify(net_f.init(jax.random.PRNGKey(0), x, t, context=ctx))
    p_q = net_q.init(jax.random.PRNGKey(0), x, t, context=ctx)
    assert (jax.tree_util.tree_structure(p_q)
            == jax.tree_util.tree_structure(params))
    out_f = np.asarray(net_f.apply(params, x, t, context=ctx))
    out_q = np.asarray(net_q.apply(params, x, t, context=ctx))
    assert np.all(np.isfinite(out_q))
    rel = np.sqrt(np.mean((out_q - out_f) ** 2) / np.mean(out_f ** 2))
    assert rel < 0.1, rel
