#!/usr/bin/env python
"""Benchmark: guided posterior sampling throughput on the flagship config.

Measures samples/sec/chip for FFHQ-256 guided sampling — the reference's
headline workload (sample_condition_openai.py: 50-step stochastic Heun,
Type-I guidance with the "convert" posterior covariance, inpainting p=0.5)
— end-to-end on one TPU chip, including the guidance VJP and the on-device
CG solves in every step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so the
baseline is a MEASUREMENT of the reference torch pipeline on this host,
recorded by `python scripts/measure_reference.py` into BASELINE_MEASURED.json
(same workload: 50-step stochastic Heun, Type-I/convert, inpainting; the
extrapolated 99-guided-NFE wall-clock). vs_baseline therefore compares one
TPU v5e chip against this host's CPU — the only reference hardware available
here — and the JSON says so via baseline_source. If the measurement file is
absent, vs_baseline is null.
"""

import json
import os
import subprocess
import sys
import time


def load_measured_baseline():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    if not os.path.exists(path):
        return None, None
    with open(path) as f:
        data = json.load(f)
    sps = data["extrapolated_50step"]["samples_per_sec"]
    hw = data["hardware"]
    src = (f"measured: reference torch pipeline on this host "
           f"({hw['cores']}-core {hw['cpu']} CPU, torch {hw['torch']}), "
           f"{sps:.6f} samples/s — see BASELINE_MEASURED.json / "
           f"scripts/measure_reference.py")
    return sps, src

# Batched 256px convs pick worse layouts than batch-1 on v5e (see
# RESULTS.md "Batch pathology root-caused"); the guided sampler therefore
# lax.maps over the batch per NFE (SamplerConfig.per_sample_map), which
# measured fastest per-sample at B=4 (11.35 vs 11.99 ms/sample/NFE at B=1,
# 25.28 batched). Cross-chip scale-out remains the dp mesh.
BATCH = 4
STEPS = 50

# The measured grid (VERDICT r4 #5): the reference's four experiment
# operators (quick_start/eval_guidance_I.sh:17-42) under the flagship
# Type-I/convert config, plus the CG-heaviest covariance (tmpd — a tensor
# variance solved by CG at EVERY sigma) on gaussian deblur. Each row is
# (operator yaml in configs/, posterior covariance type).
WORKLOADS = {
    "inpainting_convert": ("inpainting_config.yaml", "convert"),
    "gaussian_deblur_convert": ("gaussian_deblur_config.yaml", "convert"),
    "motion_deblur_convert": ("motion_deblur_config.yaml", "convert"),
    "sr4x_convert": ("super_resolution_4x_config.yaml", "convert"),
    "gaussian_deblur_tmpd": ("gaussian_deblur_config.yaml", "tmpd"),
}
DEFAULT_WORKLOAD = "inpainting_convert"


def _metric_name(workload: str) -> str:
    op, cov = WORKLOADS[workload][0].replace("_config.yaml", ""), \
        WORKLOADS[workload][1]
    return (f"samples/sec/chip (FFHQ-256 guided 50-step Heun, "
            f"Type-I {cov}, {op})")


METRIC = _metric_name(DEFAULT_WORKLOAD)


def _probe_transport(timeout_s: float) -> bool:
    """One tiny-matmul probe in a subprocess under a timeout. The axon
    transport, when down, HANGS jax calls rather than erroring (VERDICT r3),
    so an in-process probe could never return — the subprocess is the only
    cancellable form."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; "
             "print(float((jnp.ones((128,128)) @ jnp.ones((128,128)))"
             ".sum()))"],
            timeout=timeout_s, capture_output=True, text=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _emit_error(error: str, attempts: int, window_s: float) -> None:
    print(json.dumps({
        "metric": METRIC, "value": None, "unit": "samples/s",
        "vs_baseline": None, "error": error,
        "probe_attempts": attempts, "retry_window_s": round(window_s, 1),
    }))


def outage_protocol() -> int:
    """Driver-facing wrapper (VERDICT r3 #2): probe the TPU transport under
    a timeout, retry within a bounded window, run the measurement in a
    killable subprocess, and ALWAYS end with exactly one parseable JSON
    line on stdout — never a bare traceback.

    Env knobs: KDIP_BENCH_PROBE_WINDOW (s, default 1800),
    KDIP_BENCH_PROBE_TIMEOUT (s, default 120),
    KDIP_BENCH_RUN_TIMEOUT (s, default 2400)."""
    window = float(os.environ.get("KDIP_BENCH_PROBE_WINDOW", "1800"))
    # 180s, not 120: the probe subprocess pays a cold python+jax import and
    # backend init before its matmul, and on this 1-core host a concurrent
    # CPU load pushed that past 120s with a HEALTHY transport (3 false
    # "down" verdicts observed 2026-08-19; the retry window absorbed them)
    probe_timeout = float(os.environ.get("KDIP_BENCH_PROBE_TIMEOUT", "180"))
    run_timeout = float(os.environ.get("KDIP_BENCH_RUN_TIMEOUT", "2400"))

    t0, attempts, up = time.time(), 0, False
    while True:
        attempts += 1
        up = _probe_transport(probe_timeout)
        elapsed = time.time() - t0
        print(f"[bench] transport probe {attempts}: "
              f"{'UP' if up else 'down'} ({elapsed:.0f}s elapsed)",
              file=sys.stderr)
        if up or elapsed + 45 + probe_timeout > window:
            break
        time.sleep(45)
    if not up:
        _emit_error("tpu-transport-unavailable", attempts, time.time() - t0)
        return 0

    env = dict(os.environ)
    env["KDIP_BENCH_CHILD"] = "1"
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, timeout=run_timeout,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        _emit_error("bench-timeout", attempts, time.time() - t0)
        return 0
    sys.stderr.write(r.stderr)
    json_lines = [ln for ln in r.stdout.splitlines()
                  if ln.startswith("{") and '"metric"' in ln]
    if r.returncode == 0 and json_lines:
        print(json_lines[-1])
    else:
        tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
        _emit_error("bench-failed: " + " | ".join(tail)[-500:],
                    attempts, time.time() - t0)
    return 0


def main():
    import jax
    import jax.numpy as jnp

    import kdip_tpu as K
    from kdip_tpu.models import adm
    from kdip_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import yaml

    workload = os.environ.get("KDIP_BENCH_WORKLOAD", DEFAULT_WORKLOAD)
    op_yaml, cov = WORKLOADS[workload]

    # KDIP_BENCH_WINOGRAD=1 routes the UNet's 3x3 convs through the
    # Pallas-fused Winograd F(2,3) path (ops/experimental/winograd_pallas.py)
    # for A/B (measured-negative; kept for the record).
    wino = os.environ.get("KDIP_BENCH_WINOGRAD", "") == "1"
    model = adm.ffhq_unet(dtype=jnp.bfloat16, winograd=wino)
    params = model.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)),
                        jnp.zeros((1,)))["params"]
    # Pre-cast the torso kernels to bf16 once (numerically identical to the
    # per-use promote_dtype casts; kills the f32 weight-pack stream the vjp
    # byte audit found — RESULTS_VJP_AUDIT.json). KDIP_BENCH_PRECAST=0 for A/B.
    if os.environ.get("KDIP_BENCH_PRECAST", "1") == "1":
        params = K.utils.precast_inference_params(params)
    tables = K.diffusion.make_diffusion(1000, "linear")

    def model_apply(p, x, t):
        return model.apply({"params": p}, x, t.astype(jnp.float32))

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "configs", op_yaml)) as f:
        op_cfg = yaml.safe_load(f)
    op = K.operators.get_operator(seed=0, **op_cfg)

    # cg_maxiter=None resolves to the reference's 1000-iter budget;
    # converging solves exit the while_loop early so this only spends
    # iterations where a smaller cap would silently truncate
    # KDIP_BENCH_REMAT selects the vjp remat policy for A/B: "" (off,
    # default — measured fastest), "1" (full remat), or a policy name like
    # "conv_dots" (save MXU outputs, recompute elementwise chains).
    remat = os.environ.get("KDIP_BENCH_REMAT", "")
    remat = True if remat == "1" else (remat or False)
    # KDIP_BENCH_WARM=1 warm-starts each CG solve from the previous sampler
    # step's iterate (GuidanceConfig.cg_warm_start) — same tol*|b| stopping
    # rule, fewer iterations; the JSON then reports cg_total_iters.
    warm = os.environ.get("KDIP_BENCH_WARM", "") == "1"
    gcfg = K.guidance.GuidanceConfig(guidance="I", x0_cov_type=cov,
                                     remat_vjp=remat, cg_warm_start=warm)
    scfg = K.sampling_api.SamplerConfig(steps=STEPS)
    sampler = K.sampling_api.build_posterior_sampler(model_apply, tables, op,
                                                     gcfg, scfg)

    # one measurement, BATCH samples: the per_sample_map path pairs all
    # samples with the single measurement (the reference's -n semantics)
    x0 = jax.random.uniform(jax.random.key(1), (1, 256, 256, 3)) * 2 - 1
    meas = op.measure(x0, jax.random.key(2))

    jitted = jax.jit(
        lambda p, m, k: sampler(p, m, k, n=BATCH, return_info=True))
    out, info = jax.block_until_ready(jitted(params, meas, jax.random.key(3)))
    assert bool(jnp.isfinite(out).all())
    cg_max_residual = float(info["cg_max_residual"])

    n_runs = 3
    t0 = time.time()
    for i in range(n_runs):
        out, info = jitted(params, meas, jax.random.key(4 + i))
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n_runs
    cg_max_residual = max(cg_max_residual, float(info["cg_max_residual"]))

    samples_per_sec = BATCH / dt

    # ---- MFU accounting (VERDICT r2 next #3) ----
    # XLA's cost analysis under-counts programs with loops (bodies counted
    # once), so FLOPs are taken from the per-NFE unit — one guided denoise
    # = model fwd + vjp (+ the CG/FFT solve, which cost_analysis includes
    # in the same program) — and scaled by the NFE count analytically:
    # 50-step stochastic Heun = 2 evals/step except the last = 99 NFEs.
    mfu = tflops = flops_per_nfe = None
    try:
        def one_nfe(p, x, sigma):
            def f(xx):
                return model_apply(p, xx, jnp.broadcast_to(sigma, (1,)))
            y, vjp = jax.vjp(f, x)
            return y, vjp(jnp.ones_like(y))

        c = (jax.jit(one_nfe)
             .lower(params, jnp.zeros((1, 256, 256, 3)), jnp.float32(1.0))
             .compile().cost_analysis())
        if isinstance(c, (list, tuple)):
            c = c[0]
        flops_per_nfe = float(c["flops"])
        nfes = 2 * STEPS - 1
        flops_per_sample = flops_per_nfe * nfes
        tflops = samples_per_sec * flops_per_sample / 1e12
        peak = float(os.environ.get("KDIP_PEAK_TFLOPS", "197"))  # v5e bf16
        mfu = tflops / peak
    except Exception:
        pass

    if workload == DEFAULT_WORKLOAD:
        ref_sps, baseline_source = load_measured_baseline()
    else:
        ref_sps, baseline_source = None, (
            "baseline measured for the flagship inpainting workload only")
    print(json.dumps({
        "metric": _metric_name(workload),
        "value": round(samples_per_sec, 4),
        "unit": "samples/s",
        "vs_baseline": (round(samples_per_sec / ref_sps, 2)
                        if ref_sps else None),
        "baseline_source": baseline_source or "no measurement recorded",
        "tflops_sustained": round(tflops, 1) if tflops else None,
        "mfu": round(mfu, 3) if mfu else None,
        # worst CG relative residual across the measured trajectories —
        # the convergence health signal for the on-device solves
        # (tol 1e-4; see GuidanceConfig.cg_warn / VERDICT r4 #2)
        "cg_max_residual": round(cg_max_residual, 8),
        "mfu_method": (f"compiled cost_analysis of one guided NFE "
                       f"(fwd+vjp) = {flops_per_nfe/1e9:.0f} GFLOP x "
                       f"{2*STEPS-1} NFEs/sample; peak "
                       f"{os.environ.get('KDIP_PEAK_TFLOPS', '197')} "
                       f"bf16 TFLOP/s (v5e)") if flops_per_nfe else None,
        **({"cg_warm_start": True,
            "cg_total_iters": int(info["cg_total_iters"])} if warm else {}),
        **({"winograd": True,
            "note": "winograd cuts executed FLOPs 2.25x per 3x3 conv, so "
                    "mfu vs naive-conv peak understates MXU occupancy"}
           if wino else {}),
    }))


def grid() -> int:
    """`python bench.py --grid`: measure every WORKLOADS row (one killable
    subprocess each, same outage protocol as the default mode), write
    RESULTS_GRID.json, and print one summary JSON line. A workload that
    fails records an error row; the command exits 0 as long as the
    transport was up (so a partial grid is still recorded)."""
    window = float(os.environ.get("KDIP_BENCH_PROBE_WINDOW", "1800"))
    probe_timeout = float(os.environ.get("KDIP_BENCH_PROBE_TIMEOUT", "180"))
    run_timeout = float(os.environ.get("KDIP_BENCH_RUN_TIMEOUT", "2400"))

    t0, attempts, up = time.time(), 0, False
    while True:
        attempts += 1
        up = _probe_transport(probe_timeout)
        elapsed = time.time() - t0
        print(f"[bench-grid] transport probe {attempts}: "
              f"{'UP' if up else 'down'} ({elapsed:.0f}s elapsed)",
              file=sys.stderr)
        if up or elapsed + 45 + probe_timeout > window:
            break
        time.sleep(45)
    if not up:
        print(json.dumps({"grid": None,
                          "error": "tpu-transport-unavailable",
                          "probe_attempts": attempts}))
        return 1

    rows = {}
    for name in WORKLOADS:
        env = dict(os.environ)
        env["KDIP_BENCH_CHILD"] = "1"
        env["KDIP_BENCH_WORKLOAD"] = name
        t1 = time.time()
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, timeout=run_timeout,
                               capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            rows[name] = {"error": f"timeout after {run_timeout:.0f}s"}
            print(f"[bench-grid] {name}: TIMEOUT", file=sys.stderr)
            continue
        json_lines = [ln for ln in r.stdout.splitlines()
                      if ln.startswith("{") and '"metric"' in ln]
        if r.returncode == 0 and json_lines:
            rows[name] = json.loads(json_lines[-1])
            rows[name]["wall_s"] = round(time.time() - t1, 1)
            print(f"[bench-grid] {name}: {rows[name]['value']} samples/s, "
                  f"cg_max_residual={rows[name].get('cg_max_residual')}",
                  file=sys.stderr)
        else:
            tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
            rows[name] = {"error": (" | ".join(tail))[-500:]}
            print(f"[bench-grid] {name}: FAILED", file=sys.stderr)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "RESULTS_GRID.json")
    doc = {"config": f"FFHQ-256 guided {STEPS}-step stochastic Heun, "
                     f"Type-I guidance, batch {BATCH}, one v5e chip",
           "rows": rows}
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({
        "grid": {k: (v.get("value"), v.get("cg_max_residual"))
                 for k, v in rows.items()},
        "written": "RESULTS_GRID.json",
    }))
    return 0


if __name__ == "__main__":
    if os.environ.get("KDIP_BENCH_CHILD") == "1":
        main()
    elif "--grid" in sys.argv:
        sys.exit(grid())
    else:
        sys.exit(outage_protocol())
