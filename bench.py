"""Benchmark: CIFAR-10 DDPM UNet sampling throughput at 10 NFE on one chip.

Canonical config (ddpm_and_guided-diffusion/sample.sh:6-17): DPM-Solver++
multistep order 3, 10 NFE, logSNR grid, on the 35.7M-param DDPM UNet.

Ours: the whole trajectory compiled as ONE XLA program (host-planned
coefficient tables + lax.scan) with bf16 model compute / fp32 solver math and
the Pallas fused update.

Baseline: the reference's own JAX implementation (dpm_solver_jax.py) driving
the *identical* flax model at the same dtype on the same chip — an
apples-to-apples measure of the solver/orchestration layer. Falls back to a
reference-style per-step driver of our numerics if the reference import is
unavailable.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 64
STEPS = 10
REPS = 5


def build_model():
    from dpm_solver_tpu.models import DDPMUNet, DDPMUNetConfig

    cfg = DDPMUNetConfig.cifar10()
    model = DDPMUNet(cfg, compute_dtype=jnp.bfloat16)
    # jit the init: un-jitted flax init dispatches one tiny op per parameter,
    # which is pathologically slow over a tunneled TPU (~150s for this net)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)))
    print("# model init done", file=sys.stderr, flush=True)
    return lambda x, t: model.apply(params, x, t)


def _sync(out):
    """Force real device completion: through the tunneled axon backend
    `block_until_ready` returns before execution finishes, so fetch a
    scalar — the device queue is serial, so this waits for everything.
    The slice/ravel run ON DEVICE (np.asarray of the full output would
    add the whole array's tunnel-transfer time to the measurement)."""
    return float(jax.tree.leaves(out)[0].ravel()[0])


def time_fn(fn, *args, reps=REPS):
    _sync(fn(*args))  # compile + warm incl. one transfer
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def bench_ours(raw_model, ns, x_T):
    from dpm_solver_tpu import build_sampler, model_wrapper

    model_fn = model_wrapper(raw_model, ns)
    fn = build_sampler(model_fn, ns, steps=STEPS, order=3, method="multistep",
                       skip_type="logSNR")
    jfn = jax.jit(fn)
    return time_fn(lambda x: jfn(x), x_T)


def bench_reference_jax(raw_model, ns_betas, x_T):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "reference_dpm_solver_jax", "/root/reference/dpm_solver_jax.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    ns_ref = ref.NoiseScheduleVP("discrete", betas=jnp.asarray(ns_betas, jnp.float32))
    model_fn = ref.model_wrapper(
        lambda x, t, **kw: raw_model(x, t), ns_ref, model_type="noise")
    solver = ref.DPM_Solver(model_fn, ns_ref, predict_x0=True)

    def run(x):
        # the reference's discrete-schedule interpolation needs array-typed
        # endpoint times (float .reshape fails inside its interpolate_fn)
        return solver.sample(x, steps=STEPS, order=3, skip_type="logSNR",
                             method="multistep",
                             t_start=jnp.asarray(1.0),
                             t_end=jnp.asarray(1e-3))

    jrun = jax.jit(run)
    return time_fn(lambda x: jrun(x), x_T)


def bench_per_step_driver(raw_model, ns, x_T):
    """Reference-style orchestration of our numerics: one jitted model+update
    per NFE, Python driver between steps (how the torch reference executes)."""
    from dpm_solver_tpu import model_wrapper
    from dpm_solver_tpu.solver import make_plan
    from dpm_solver_tpu.solver.sample import _combine, _make_eval_fn

    model_fn = model_wrapper(raw_model, ns)
    plan = make_plan(ns, steps=STEPS, order=3, method="multistep", skip_type="logSNR")
    eval_fn = jax.jit(_make_eval_fn(model_fn, True, None))
    update = jax.jit(lambda a, b, x, hist: _combine(a, b, None, x, hist, None))

    rows = jax.tree.map(np.asarray, plan.scan_rows)
    tail = jax.tree.map(np.asarray, plan.tail_rows)

    def run(x):
        hist = jnp.zeros((3,) + x.shape, x.dtype)
        m = eval_fn(x, jnp.float32(plan.t_first), plan.alpha_first, plan.sigma_first)
        hist = jnp.concatenate([m[None], hist[:-1]], 0)
        for i in range(rows.a.shape[0]):
            x = update(rows.a[i], rows.b[i], x, hist)
            m = eval_fn(x, rows.t_next[i], rows.alpha_next[i], rows.sigma_next[i])
            hist = jnp.concatenate([m[None], hist[:-1]], 0)
        x = update(tail.a[0], tail.b[0], x, hist)
        return x

    return time_fn(run, x_T)


def model_eval_flops(raw_model, x_T):
    """XLA cost-analysis flops of ONE model evaluation (cost analysis counts
    a scan body once, so per-trajectory flops = this x NFE; CLAUDE.md
    roofline discipline)."""
    try:
        c = jax.jit(raw_model).lower(x_T, jnp.zeros((x_T.shape[0],))).compile()
        ca = c.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca.get("flops", 0.0))
    except Exception as e:  # noqa: BLE001
        print(f"# cost analysis unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)
        return 0.0


def _device_health_check(timeout_s: int = 300, attempts: int = 5,
                         retry_sleep_s: int = 240) -> None:
    """The tunneled TPU's failure mode is a HANG on first device use (see
    CLAUDE.md), which would wedge this bench indefinitely. Probe a tiny
    matmul in a subprocess with a hard timeout; prints nothing on the
    happy path. The tunnel also DROPS transiently (round 4's driver
    capture was lost to exactly that), so a failed probe is retried for
    a bounded window (~20 min total) before giving up with exit(1)."""
    import subprocess

    src = ("import jax, jax.numpy as jnp; x = jnp.ones((128, 128));"
           " print('OK', float((x @ x).ravel()[0]))")
    for attempt in range(1, attempts + 1):
        why = ""
        try:
            r = subprocess.run([sys.executable, "-c", src],
                               capture_output=True, text=True,
                               timeout=timeout_s)
            if r.returncode == 0 and "OK 128.0" in r.stdout:
                return
            why = ("device health probe failed:\n"
                   + (r.stdout + r.stderr)[-500:])
        except subprocess.TimeoutExpired:
            why = f"device health probe hung ({timeout_s}s) — tunnel down"
        if attempt < attempts:
            print(f"# health probe attempt {attempt}/{attempts}: {why}"
                  f"\n# retrying in {retry_sleep_s}s", file=sys.stderr,
                  flush=True)
            time.sleep(retry_sleep_s)
    print(f"# bench aborted after {attempts} probe attempts: {why}",
          file=sys.stderr)
    raise SystemExit(1)


def main():
    from dpm_solver_tpu import NoiseScheduleVP

    # Health check FIRST: anything that initializes the jax backend
    # (including jax.default_backend() in the cache helper) hangs forever
    # when the tunnel is down.
    _device_health_check()
    try:  # persistent compile cache: repeat runs start in seconds (TPU only)
        from benchmarks._cache import enable_compile_cache

        enable_compile_cache()
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        pass
    betas = np.linspace(1e-4, 0.02, 1000)
    ns = NoiseScheduleVP.discrete(betas=betas)
    raw_model = build_model()
    x_T = jnp.asarray(np.random.default_rng(0).standard_normal(
        (BATCH, 32, 32, 3)), jnp.float32)

    t_ours = bench_ours(raw_model, ns, x_T)
    print(f"# ours timed: {t_ours*1e3:.1f} ms/batch", file=sys.stderr, flush=True)
    try:
        t_base = bench_reference_jax(raw_model, betas, x_T)
        baseline = "reference_dpm_solver_jax"
    except Exception as e:  # noqa: BLE001
        print(f"# reference baseline failed ({type(e).__name__}: {e}); "
              "using per-step driver", file=sys.stderr)
        t_base = bench_per_step_driver(raw_model, ns, x_T)
        baseline = "per_step_driver"

    ours = BATCH / t_ours
    base = BATCH / t_base
    flops = STEPS * model_eval_flops(raw_model, x_T)
    peak = None if jax.devices()[0].platform == "cpu" else 197e12  # v5e bf16
    tfs = flops / t_ours / 1e12
    print(f"# ours: {ours:.1f} samples/s ({t_ours*1e3:.1f} ms/batch of {BATCH}, "
          f"{tfs:.1f} TF/s); baseline[{baseline}]: {base:.1f} samples/s",
          file=sys.stderr)
    print(json.dumps({
        "metric": "cifar10_ddpm_unet_10nfe_samples_per_sec_per_chip",
        "value": round(ours, 2),
        "unit": "samples/s",
        "vs_baseline": round(ours / base, 3),
        "flops_per_batch": flops,
        "implied_tflops": round(tfs, 2),
        "mfu": round(flops / t_ours / peak, 4) if peak else None,
    }))


if __name__ == "__main__":
    main()
