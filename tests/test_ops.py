"""Pallas fused-update kernel vs the plain XLA combine (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from dpm_solver_tpu.ops.fused_update import fused_solver_update


def test_fused_update_matches_reference_combine():
    rng = np.random.default_rng(0)
    for shape in [(2, 32, 32, 3), (5, 7, 11), (1, 130)]:  # incl. non-aligned sizes
        x = rng.standard_normal(shape).astype(np.float32)
        hist = rng.standard_normal((3,) + shape).astype(np.float32)
        z = rng.standard_normal(shape).astype(np.float32)
        a, b, s = 0.7, np.asarray([0.3, -0.2, 0.05], np.float32), 0.11
        want = a * x + b[0] * hist[0] + b[1] * hist[1] + b[2] * hist[2] + s * z
        got = fused_solver_update(
            jnp.float32(a), jnp.asarray(b), jnp.float32(s),
            jnp.asarray(x), jnp.asarray(hist), jnp.asarray(z), interpret=True)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)
        # ODE variant (no noise operand)
        want2 = a * x + b[0] * hist[0] + b[1] * hist[1] + b[2] * hist[2]
        got2 = fused_solver_update(
            jnp.float32(a), jnp.asarray(b), None,
            jnp.asarray(x), jnp.asarray(hist), None, interpret=True)
        np.testing.assert_allclose(np.asarray(got2), want2, rtol=1e-6, atol=1e-6)


def test_fused_update_under_scan_traced_coeffs():
    """Coefficients as traced scan values: one kernel, many steps."""
    shape = (2, 8, 128)
    x = jnp.ones(shape)
    hist = jnp.ones((3,) + shape) * 0.5
    coefs = jnp.asarray([[1.0, 0.1, 0.0, 0.0], [0.5, 0.2, 0.1, 0.0]])

    def body(x, c):
        y = fused_solver_update(c[0], c[1:4], None, x, hist, None, interpret=True)
        return y, ()

    y, _ = jax.lax.scan(body, x, coefs)
    want = (1.0 * 1 + 0.05) * 0.5 + 0.2 * 0.5 + 0.1 * 0.5
    np.testing.assert_allclose(np.asarray(y)[0, 0, 0], want, rtol=1e-6)
