"""Trajectory executor + the public DPM_Solver API.

The executor turns a host-built :class:`SamplePlan` into a single XLA program:
a `lax.scan` over the homogeneous coefficient rows (multistep) plus a short
unrolled tail (singlestep micro-ops / the final no-eval update / denoise).

Public surface mirrors the reference `DPM_Solver`
(dpm_solver_pytorch.py:337-1245): `.sample`, `.inverse`, `.add_noise`, the
same constructor knobs, plus a purely functional `build_sampler` for
pjit/shard_map users.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp

from dpm_solver_tpu.schedule import NoiseScheduleVP
from dpm_solver_tpu.solver import updates as U
from dpm_solver_tpu.solver.correctors import make_dynamic_thresholding
from dpm_solver_tpu.solver.plan import (
    SamplePlan,
    build_multistep_plan,
    build_singlestep_plan,
    build_unipc_plan,
)
from dpm_solver_tpu.utils.trees import bcast_right

METHODS = ("multistep", "singlestep", "singlestep_fixed", "adaptive",
           "unipc")


def _push_hist(hist, m):
    """hist: [3, ...] newest first."""
    return jnp.concatenate([m[None], hist[:-1]], axis=0)


def _combine(row_a, row_b, row_s, x, hist, z, use_pallas=False):
    """x_next = a*x + b @ hist (+ s*z) — the fused update hot path.

    Default path: explicit multiply-adds that XLA fuses into one VPU pass over
    HBM. `use_pallas=True` routes through the guaranteed single-pass Pallas
    kernel (ops/fused_update.py) instead.
    """
    if use_pallas:
        from dpm_solver_tpu.ops.fused_update import fused_solver_update

        return fused_solver_update(row_a, row_b, row_s, x, hist, z)
    out = row_a * x + row_b[0] * hist[0] + row_b[1] * hist[1] + row_b[2] * hist[2]
    if z is not None:
        out = out + row_s * z
    return out


def _to_x0(x, eps, t, alpha_t, sigma_t, correcting_x0_fn):
    """Reference `data_prediction_fn` core (dpm_solver_pytorch.py:433-442)."""
    x0 = (x - sigma_t * eps) / alpha_t
    if correcting_x0_fn is not None:
        x0 = correcting_x0_fn(x0, t)
    return x0


def _make_eval_fn(model_fn, predict_x0: bool, correcting_x0_fn):
    """Per-NFE model evaluation in the solver's prediction space."""

    def eval_fn(x, t, alpha_t, sigma_t):
        eps = model_fn(x, t)
        if not predict_x0:
            return eps
        return _to_x0(x, eps, t, alpha_t, sigma_t, correcting_x0_fn)

    return eval_fn


def execute_plan(
    model_fn: Callable,
    plan: SamplePlan,
    x: jax.Array,
    *,
    predict_x0: bool,
    rng: Optional[jax.Array] = None,
    correcting_x0_fn: Optional[Callable] = None,
    correcting_xt_fn: Optional[Callable] = None,
    return_intermediate: bool = False,
    use_pallas: Optional[bool] = None,
):
    """Run a planned trajectory. Pure function of (x, rng); jit/pjit-safe.

    `use_pallas` opts into the fused Pallas update kernel (TPU only; no CPU
    compile path outside interpret mode). Default is the plain jnp
    expression: the committed A/B (benchmarks/fused_update_bench.py, v5e)
    shows XLA's own fusion beats the kernel 2.4-15x at every real solver
    shape — the update operands are far too small to amortize kernel
    invocation + relayout. The kernel remains the guaranteed-single-pass
    form for surrounding programs where XLA declines to fuse.
    """
    if plan.has_noise and rng is None:
        raise ValueError("SDE plan requires an rng key")
    if use_pallas is None:
        use_pallas = False
    eval_fn = _make_eval_fn(model_fn, predict_x0, correcting_x0_fn)
    intermediates: List[jax.Array] = []
    hist = jnp.zeros((3,) + x.shape, x.dtype)

    import math

    # --- initial model eval (multistep-style plans) ---
    if not math.isnan(plan.t_first):
        t0 = jnp.asarray(plan.t_first, x.dtype)
        m0 = eval_fn(x, t0, plan.alpha_first, plan.sigma_first)
        hist = _push_hist(hist, m0)
        if plan.initial_correct_record:
            if correcting_xt_fn is not None:
                x = correcting_xt_fn(x, t0, 0)
            if return_intermediate:
                intermediates.append(x)

    # --- homogeneous scan body: update -> correct -> record -> eval ---
    if plan.scan_rows is not None:
        rows = plan.scan_rows
        n = rows.n_ops
        has_corr = rows.b_corr is not None  # UniPC predictor-corrector rows

        def body(carry, inp):
            x, hist = carry
            if has_corr:
                (i, a, b, s_noise, t_next, alpha_next, sigma_next,
                 bc, cc) = inp
            else:
                i, a, b, s_noise, t_next, alpha_next, sigma_next = inp
            z = None
            if plan.has_noise:
                z = jax.random.normal(jax.random.fold_in(rng, i), x.shape, x.dtype)
            x_new = _combine(a, b, s_noise, x, hist, z, use_pallas)
            if has_corr:
                # UniC: the step's single model eval happens at the
                # predicted point (xt-corrected first — every model eval in
                # this file sees corrected state), the committed state
                # re-anchors at the PREVIOUS x, and the eval is reused as
                # next history
                if correcting_xt_fn is not None:
                    x_new = correcting_xt_fn(x_new, t_next, i)
                m = eval_fn(x_new, t_next, alpha_next, sigma_next)
                x_new = _combine(a, bc, s_noise, x, hist, None,
                                 use_pallas) + cc * m
                if correcting_xt_fn is not None:
                    x_new = correcting_xt_fn(x_new, t_next, i)
            else:
                if correcting_xt_fn is not None:
                    x_new = correcting_xt_fn(x_new, t_next, i)
                m = eval_fn(x_new, t_next, alpha_next, sigma_next)
            hist = _push_hist(hist, m)
            y = x_new if return_intermediate else jnp.zeros((), x.dtype)
            return (x_new, hist), y

        step_idx = jnp.arange(1, n + 1)
        scan_inputs = [step_idx, rows.a, rows.b, rows.s_noise, rows.t_next,
                       rows.alpha_next, rows.sigma_next]
        if has_corr:
            scan_inputs += [rows.b_corr, rows.c_corr]
        (x, hist), ys = jax.lax.scan(body, (x, hist), tuple(scan_inputs))
        if return_intermediate:
            intermediates.extend(ys[i] for i in range(n))

    # --- scanned singlestep segment groups (same-order runs) ---
    # Each SegScan compiles to one lax.scan whose body executes the R static
    # micro-ops of a segment; history is segment-local (all singlestep
    # updates anchor at the segment start) so the carry is just x.
    for gs in plan.seg_scans:
        rows = gs.rows
        R = len(gs.eval_after)

        def seg_body(x, inp, _R=R, _gs=gs):
            row, step = inp
            hist = jnp.zeros((3,) + x.shape, x.dtype)
            y = x
            for k in range(_R):
                y = _combine(row.a[k], row.b[k], row.s_noise[k], x, hist,
                             None, use_pallas)
                if _gs.commit[k]:
                    if correcting_xt_fn is not None:
                        y = correcting_xt_fn(y, row.t_next[k], step)
                    x = y
                if _gs.eval_after[k]:
                    m = eval_fn(y, row.t_next[k], row.alpha_next[k],
                                row.sigma_next[k])
                    hist = _push_hist(hist, m)
            out = x if return_intermediate else jnp.zeros((), x.dtype)
            return x, out

        x, ys = jax.lax.scan(seg_body, x, (rows, jnp.asarray(gs.step_index)))
        if return_intermediate:
            intermediates.extend(ys[i] for i in range(gs.n_seg))

    # --- unrolled tail: heterogeneous micro-ops ---
    if plan.tail_rows is not None:
        rows = plan.tail_rows
        for k in range(rows.n_ops):
            a = rows.a[k]
            b = rows.b[k]
            s_noise = rows.s_noise[k]
            t_next = rows.t_next[k]
            step = plan.tail_step_index[k]
            z = None
            if plan.has_noise:
                z = jax.random.normal(jax.random.fold_in(rng, step), x.shape, x.dtype)
            y = _combine(a, b, s_noise, x, hist, z, use_pallas)
            if plan.tail_commit[k]:
                if correcting_xt_fn is not None:
                    y = correcting_xt_fn(y, t_next, step)
                x = y
                if return_intermediate:
                    intermediates.append(x)
            if plan.tail_eval[k]:
                m = eval_fn(y, t_next, rows.alpha_next[k], rows.sigma_next[k])
                hist = _push_hist(hist, m)

    # --- optional denoise-to-zero: x <- x0_prediction(x, t_0) ---
    if plan.denoise_final:
        t_d = jnp.asarray(plan.t_denoise, x.dtype)
        if predict_x0:
            x = eval_fn(x, t_d, plan.alpha_denoise, plan.sigma_denoise)
        else:
            x = _to_x0(x, model_fn(x, t_d), t_d, plan.alpha_denoise,
                       plan.sigma_denoise, correcting_x0_fn)
        if correcting_xt_fn is not None:
            x = correcting_xt_fn(x, t_d, plan.denoise_step_index)
        if return_intermediate:
            intermediates.append(x)

    if return_intermediate:
        return x, intermediates
    return x


# --------------------------------------------------------------------------- #
# plan construction from reference-style arguments
# --------------------------------------------------------------------------- #


def make_plan(
    ns: NoiseScheduleVP,
    *,
    steps: int = 20,
    t_start: Optional[float] = None,
    t_end: Optional[float] = None,
    order: int = 2,
    skip_type: str = "time_uniform",
    method: str = "multistep",
    lower_order_final: bool = True,
    denoise_to_zero: bool = False,
    solver_type: str = "dpmsolver",
    algorithm_type: str = "dpmsolver++",
    timesteps=None,
    dtype=jnp.float32,
    variant: str = "bh2",
) -> SamplePlan:
    if method == "unipc":
        return build_unipc_plan(
            ns, steps, order, t_start=t_start, t_end=t_end,
            skip_type=skip_type, algorithm_type=algorithm_type,
            variant=variant, lower_order_final=lower_order_final,
            denoise_to_zero=denoise_to_zero, timesteps=timesteps,
            dtype=dtype,
        )
    if method == "multistep":
        return build_multistep_plan(
            ns, steps, order, t_start=t_start, t_end=t_end, skip_type=skip_type,
            algorithm_type=algorithm_type, solver_type=solver_type,
            lower_order_final=lower_order_final, denoise_to_zero=denoise_to_zero,
            timesteps=timesteps, dtype=dtype,
        )
    elif method in ("singlestep", "singlestep_fixed"):
        return build_singlestep_plan(
            ns, steps, order, t_start=t_start, t_end=t_end, skip_type=skip_type,
            algorithm_type=algorithm_type, solver_type=solver_type,
            fixed=(method == "singlestep_fixed"), denoise_to_zero=denoise_to_zero,
            dtype=dtype,
        )
    raise ValueError(f"make_plan supports fixed-grid methods, got {method!r}")


def jit_hoisting_constants(fn, x, rng=None):
    """jit `fn(x, rng=...)` with closed-over arrays passed as ARGUMENTS.

    The reference-compatible API closes the solver over `model_fn` — and with
    it the model parameters. Closed-over concrete arrays are embedded in the
    lowered HLO as dense constants (a 116M-param UNet inflates the serialized
    program by ~600 MB), which blows up compile memory/time and exceeds
    remote-compile payload limits. Tracing to a jaxpr and re-feeding
    `jaxpr.consts` through `eval_jaxpr` keeps the weights device-resident jit
    arguments while preserving the closure API. (jax.closure_convert does NOT
    do this: it only hoists traced values, not concrete arrays.)
    """
    from jax import core as jcore

    out_tree = [None]

    if rng is None:
        def flat_fn(xx):
            out = fn(xx)
            flat, out_tree[0] = jax.tree_util.tree_flatten(out)
            return flat

        closed = jax.make_jaxpr(flat_fn)(x)
        consts = closed.consts
        jfn = jax.jit(lambda xx, *cs: jcore.eval_jaxpr(closed.jaxpr, cs, xx))
        tree = out_tree[0]
        return lambda xx, rng=None: jax.tree_util.tree_unflatten(
            tree, jfn(xx, *consts))

    def flat_fn(xx, rr):
        out = fn(xx, rng=rr)
        flat, out_tree[0] = jax.tree_util.tree_flatten(out)
        return flat

    closed = jax.make_jaxpr(flat_fn)(x, rng)
    consts = closed.consts
    jfn = jax.jit(lambda xx, rr, *cs: jcore.eval_jaxpr(closed.jaxpr, cs, xx, rr))
    tree = out_tree[0]
    return lambda xx, rng: jax.tree_util.tree_unflatten(
        tree, jfn(xx, rng, *consts))


def build_sampler(
    model_fn: Callable,
    ns: NoiseScheduleVP,
    *,
    algorithm_type: str = "dpmsolver++",
    correcting_x0_fn: Optional[Callable] = None,
    correcting_xt_fn: Optional[Callable] = None,
    return_intermediate: bool = False,
    use_pallas: Optional[bool] = None,
    **plan_kwargs: Any,
) -> Callable:
    """Functional entry: returns a pure `fn(x, rng=None) -> x0` closure.

    The closure contains the full planned trajectory; wrap it in jit / pjit /
    shard_map at the call site. This is the path the pjit mesh sampler uses.
    """
    plan = make_plan(ns, algorithm_type=algorithm_type, **plan_kwargs)
    predict_x0 = U.is_predict_x0(algorithm_type)

    def fn(x, rng=None):
        return execute_plan(
            model_fn, plan, x,
            predict_x0=predict_x0, rng=rng,
            correcting_x0_fn=correcting_x0_fn,
            correcting_xt_fn=correcting_xt_fn,
            return_intermediate=return_intermediate,
            use_pallas=use_pallas,
        )

    return fn


# --------------------------------------------------------------------------- #
# reference-compatible class API
# --------------------------------------------------------------------------- #


class DPM_Solver:
    """Drop-in equivalent of the reference `DPM_Solver` class.

    Differences from the reference (all TPU-motivated):
      * `.sample` compiles the whole trajectory into one XLA program and
        caches the compiled executable per configuration.
      * SDE algorithm types ("sde-dpmsolver", "sde-dpmsolver++") are
        supported natively; pass `rng` to `.sample`.
      * `correcting_xt_fn(x, t, step)` receives a traced scalar t and, inside
        the scanned portion, a traced step index.
    """

    def __init__(
        self,
        model_fn: Callable,
        noise_schedule: NoiseScheduleVP,
        algorithm_type: str = "dpmsolver++",
        correcting_x0_fn: Optional[Any] = None,
        correcting_xt_fn: Optional[Callable] = None,
        thresholding_max_val: float = 1.0,
        dynamic_thresholding_ratio: float = 0.995,
        predict_x0: Optional[bool] = None,
        thresholding: Optional[bool] = None,
        max_val: Optional[float] = None,
    ):
        # older-generation kwargs (dpm_solver_jax.py:351: DPM_Solver(model_fn,
        # ns, predict_x0, thresholding, max_val)) map onto the new API so
        # score_sde_jax-era call sites work unchanged
        if predict_x0 is not None:
            algorithm_type = "dpmsolver++" if predict_x0 else "dpmsolver"
        if thresholding:
            correcting_x0_fn = "dynamic_thresholding"
        if max_val is not None:
            thresholding_max_val = float(max_val)
        if algorithm_type not in U.ALGORITHM_TYPES:
            raise ValueError(
                f"algorithm_type must be one of {U.ALGORITHM_TYPES}, got {algorithm_type!r}"
            )
        self.model_fn_raw = model_fn
        self.noise_schedule = noise_schedule
        self.algorithm_type = algorithm_type
        if correcting_x0_fn == "dynamic_thresholding":
            self.correcting_x0_fn = make_dynamic_thresholding(
                dynamic_thresholding_ratio, thresholding_max_val
            )
        else:
            self.correcting_x0_fn = correcting_x0_fn
        self.correcting_xt_fn = correcting_xt_fn
        self._compiled_cache = {}

    # -- reference helper surface ------------------------------------------------

    def noise_prediction_fn(self, x, t):
        return self.model_fn_raw(x, t)

    def data_prediction_fn(self, x, t):
        ns = self.noise_schedule
        eps = self.noise_prediction_fn(x, t)
        alpha_t = bcast_right(ns.marginal_alpha(t), x.ndim)
        sigma_t = bcast_right(ns.marginal_std(t), x.ndim)
        x0 = (x - sigma_t * eps) / alpha_t
        if self.correcting_x0_fn is not None:
            x0 = self.correcting_x0_fn(x0, t)
        return x0

    def add_noise(self, x, t, noise=None, rng=None):
        """xt = alpha_t x + sigma_t noise; t of shape (t_size,).

        (ref: dpm_solver_pytorch.py:1012-1030)
        """
        ns = self.noise_schedule
        t = jnp.atleast_1d(jnp.asarray(t))
        alpha_t, sigma_t = ns.marginal_alpha(t), ns.marginal_std(t)
        if noise is None:
            if rng is None:
                raise ValueError("add_noise needs `noise` or `rng`")
            noise = jax.random.normal(rng, (t.shape[0],) + x.shape, x.dtype)
        x = x[None]
        xt = bcast_right(alpha_t, x.ndim) * x + bcast_right(sigma_t, x.ndim) * noise
        return xt[0] if t.shape[0] == 1 else xt

    # -- sampling ----------------------------------------------------------------

    def sample(
        self,
        x: jax.Array,
        steps: int = 20,
        t_start: Optional[float] = None,
        t_end: Optional[float] = None,
        order: int = 2,
        skip_type: str = "time_uniform",
        method: str = "multistep",
        lower_order_final: bool = True,
        denoise_to_zero: bool = False,
        solver_type: str = "dpmsolver",
        atol: float = 0.0078,
        rtol: float = 0.05,
        return_intermediate: bool = False,
        rng: Optional[jax.Array] = None,
        jit: bool = True,
        denoise: Optional[bool] = None,
        variant: str = "bh2",
        mesh=None,
    ):
        if denoise is not None:  # older JAX kwarg (dpm_solver_jax.py:966-968)
            denoise_to_zero = bool(denoise)
        if method not in METHODS:
            raise ValueError(f"method must be one of {METHODS}, got {method!r}")
        # the older JAX API spells it 'dpm_solver' (dpm_solver_jax.py:541)
        solver_type = {"dpm_solver": "dpmsolver"}.get(solver_type, solver_type)
        if mesh is not None and not jit:
            raise ValueError(
                "mesh= implies a pjit-compiled sampler; jit=False is not "
                "supported with a mesh (drop mesh= for eager execution)")
        if mesh is not None and method == "adaptive":
            raise ValueError(
                "method='adaptive' does not take a mesh (per-chip step-size "
                "control would diverge across shards); shard fixed-grid "
                "methods, or pjit adaptive_sample yourself")
        if method == "adaptive":
            if return_intermediate:
                raise ValueError("cannot save intermediates with the adaptive solver")
            if self.correcting_xt_fn is not None:
                raise ValueError("cannot use correcting_xt_fn with the adaptive solver")
            from dpm_solver_tpu.solver.adaptive import adaptive_sample

            x_out, _nfe = adaptive_sample(
                self.model_fn_raw, self.noise_schedule, x,
                order=order, t_start=t_start, t_end=t_end,
                algorithm_type=self.algorithm_type,
                correcting_x0_fn=self.correcting_x0_fn,
                atol=atol, rtol=rtol, solver_type=solver_type, jit=jit,
            )
            if denoise_to_zero:
                # the reference applies denoise_to_zero after every method,
                # adaptive included (dpm_solver_pytorch.py:1235-1241)
                ns = self.noise_schedule
                t_d = (1.0 / ns.total_N if ns.schedule == "discrete"
                       else 1e-3) if t_end is None else t_end
                x_out = _to_x0(
                    x_out, self.model_fn_raw(x_out, jnp.asarray(t_d, x.dtype)),
                    jnp.asarray(t_d, x.dtype),
                    float(ns.marginal_alpha_np(t_d)),
                    float(ns.marginal_std_np(t_d)), self.correcting_x0_fn)
            return x_out

        key = (
            steps, t_start, t_end, order, skip_type, method, lower_order_final,
            denoise_to_zero, solver_type, return_intermediate, x.shape,
            str(x.dtype), jit, rng is None, variant, mesh,
        )
        fn = self._compiled_cache.get(key)
        if fn is None:
            plan = make_plan(
                self.noise_schedule, steps=steps, t_start=t_start, t_end=t_end,
                order=order, skip_type=skip_type, method=method,
                lower_order_final=lower_order_final, denoise_to_zero=denoise_to_zero,
                solver_type=solver_type, algorithm_type=self.algorithm_type,
                variant=variant,
            )
            fn = partial(
                execute_plan, self.model_fn_raw, plan,
                predict_x0=U.is_predict_x0(self.algorithm_type),
                correcting_x0_fn=self.correcting_x0_fn,
                correcting_xt_fn=self.correcting_xt_fn,
                return_intermediate=return_intermediate,
            )
            if mesh is not None:
                # one pjit program, latent batch sharded over the mesh's
                # data axis, weights hoisted to replicated jit arguments
                # (replaces the reference's mp.spawn/DDP sampling launcher)
                from dpm_solver_tpu.parallel import make_sharded_sampler

                if plan.has_noise and rng is None:
                    # match the single-device path's validation instead of
                    # falling through to make_sharded_sampler's PRNGKey(0)
                    # default (a silent deterministic-noise trap)
                    raise ValueError("SDE plan requires an rng key")
                raw_fn = fn
                # donate_x=False: callers own x_T in this reference-shaped
                # API and may reuse it (e.g. to compare solver settings)
                fn = make_sharded_sampler(
                    lambda xx, rr: raw_fn(xx, rng=rr), mesh, donate_x=False)
            elif jit:
                fn = jit_hoisting_constants(fn, x, rng)
            self._compiled_cache[key] = fn
        return fn(x, rng=rng)

    def inverse(
        self,
        x: jax.Array,
        steps: int = 20,
        t_start: Optional[float] = None,
        t_end: Optional[float] = None,
        order: int = 2,
        skip_type: str = "time_uniform",
        method: str = "multistep",
        lower_order_final: bool = True,
        denoise_to_zero: bool = False,
        solver_type: str = "dpmsolver",
        atol: float = 0.0078,
        rtol: float = 0.05,
        return_intermediate: bool = False,
        rng: Optional[jax.Array] = None,
        jit: bool = True,
    ):
        """Run the ODE t_start -> T for deterministic encoding (DiffEdit).

        (ref: dpm_solver_pytorch.py:1032-1045)
        """
        ns = self.noise_schedule
        # same default as the plan builders: 1/N for discrete tables, 1e-3
        # for continuous schedules (the reference's continuous eps)
        t_0 = ((1.0 / ns.total_N if ns.schedule == "discrete" else 1e-3)
               if t_start is None else t_start)
        t_T = ns.T if t_end is None else t_end
        return self.sample(
            x, steps=steps, t_start=t_0, t_end=t_T, order=order, skip_type=skip_type,
            method=method, lower_order_final=lower_order_final,
            denoise_to_zero=denoise_to_zero, solver_type=solver_type,
            atol=atol, rtol=rtol, return_intermediate=return_intermediate,
            rng=rng, jit=jit,
        )


# backwards-compatible private alias
_jit_hoisting_constants = jit_hoisting_constants
