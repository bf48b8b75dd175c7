"""In-program loop timing for sub-10ms kernels through the tunneled chip.

Per-call timing through the axon tunnel carries a PER-DISPATCH overhead
that varies by session from ~0.2 ms to ~3 ms (measured 2026-08-18: a 5 us
128x128 dot timed 0.56 ms/call; a 0.69 ms matmul timed 2.4-11 ms/call).
Multi-ms kernels and whole-pipe runs are fine; anything sub-10 ms must be
timed as N sequential applications inside ONE jit program so the tunnel
round-trip is paid once per measurement, not once per application.

`chain_time` builds that loop with a serial data dependence (each
iteration's output is folded back into the carry at weight ~2^-120, which
underflows to a numerical no-op in bf16/f32 but is opaque to XLA) so the
compiler can neither hoist the kernel out of the loop nor dead-code-eliminate
all but one output element.
"""

from __future__ import annotations

import time


def chain_time(kernel, x, extras=(), iters=20, reps=3):
    """Seconds per application of `kernel(x, *extras)` on the default device.

    kernel's output must either match x.shape or match on leading dims with
    a last dim >= x's (it is sliced back to x.shape for the carry).
    `extras` are passed as jit arguments (not closure constants — big
    closures bloat the HLO and hang remote compiles, see CLAUDE.md).
    """
    import jax
    import jax.numpy as jnp

    eps = jnp.asarray(2.0 ** -120, x.dtype)

    fn = jax.jit(lambda c, *ex: jax.lax.fori_loop(
        0, iters,
        lambda i, cc: cc + eps * _slice_like(kernel(cc, *ex), cc), c))

    out = fn(x, *extras)
    float(out.ravel()[0])  # device-side scalar sync (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(x, *extras)
    float(out.ravel()[0])
    return (time.perf_counter() - t0) / (reps * iters)


def _slice_like(o, c):
    upd = o if o.shape == c.shape else o[..., : c.shape[-1]]
    return upd.astype(c.dtype)
