#!/usr/bin/env python
"""Per-kernel device-time breakdown of the flagship guided NFE.

Captures a real jax.profiler trace of the production per-NFE unit (one
guided denoise on the bench.py FFHQ-256 Type-I/convert inpainting config)
on the TPU, parses the xplane with xprof, and prints the top HLO ops by
self time plus a category rollup (conv / attention-matmul / elementwise /
reduce / copy ...).

Why: RESULTS_ROOFLINE.json's byte accounting comes from XLA cost_analysis,
which counts bytes an op *touches* — fused producers make the apparent
HBM bandwidth exceed the 819 GB/s peak (up to 143%), so it upper-bounds
but cannot prove where device time actually goes. The profiler measures
it directly.

Writes RESULTS_PROFILE.json. Run on the real chip: python scripts/profile_nfe.py
"""

import glob
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_denoise():
    import kdip_tpu as K
    from kdip_tpu.models import adm

    model = adm.ffhq_unet(dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)),
                        jnp.zeros((1,)))["params"]
    tables = K.diffusion.make_diffusion(1000, "linear")

    def model_apply(p, x, t):
        return model.apply({"params": p}, x, t.astype(jnp.float32))

    op = K.operators.get_operator(
        "inpainting", sigma_s=0.05,
        mask_opt=dict(mask_type="random", mask_prob_range=(0.5, 0.5),
                      image_size=256), seed=0)
    gcfg = K.guidance.GuidanceConfig(guidance="I", x0_cov_type="convert",
                                     cg_maxiter=100)
    x0 = jax.random.uniform(jax.random.key(1), (1, 256, 256, 3)) * 2 - 1
    meas = op.measure(x0, jax.random.key(2))
    uncond, var_fn = K.guidance.make_openai_uncond(model_apply, tables, gcfg)
    denoise = K.guidance.make_condition_denoiser(uncond, var_fn, op, meas,
                                                 gcfg, params=params)
    return denoise


def newest_xplane(logdir):
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    return max(paths, key=os.path.getmtime)


def parse_ops(xplane_path):
    from xprof.convert import raw_to_tool_data as r

    data, _ = r.xspace_to_tool_data([xplane_path], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    return json.loads(data)


CATEGORIES = (
    ("conv", ("convolution", "conv")),
    ("matmul", ("dot", "einsum", "matmul")),
    ("fft", ("fft",)),
    ("reduce", ("reduce", "norm", "softmax", "mean", "variance", "sum")),
    ("data-movement", ("copy", "transpose", "reshape", "concatenate",
                       "slice", "pad", "gather", "scatter", "select",
                       "dynamic")),
    ("elementwise", ("fused", "add", "mul", "sub", "div", "exp", "rsqrt",
                     "tanh", "sigmoid", "silu", "convert", "compare",
                     "broadcast", "max", "min", "loop")),
)


def categorize(name):
    low = name.lower()
    for cat, keys in CATEGORIES:
        if any(k in low for k in keys):
            return cat
    return "other"


def main():
    denoise = build_denoise()
    sigma_hi, sigma_lo = jnp.float32(10.0), jnp.float32(0.1)
    x = jax.random.normal(jax.random.key(3), (1, 256, 256, 3)) * 10.0
    jd = jax.jit(denoise)
    key = jax.random.key(4)
    # warm both branches
    jax.block_until_ready(jd(x, sigma_hi, key))
    jax.block_until_ready(jd(x * 0.01, sigma_lo, key))

    logdir = "/tmp/kdip_profile_nfe"
    os.system(f"rm -rf {logdir}")
    t0 = time.time()
    with jax.profiler.trace(logdir):
        for i in range(8):
            out = jd(x, sigma_hi, jax.random.key(5 + i))
        jax.block_until_ready(out)
    wall = time.time() - t0
    print(f"traced 8 high-sigma NFEs in {wall:.2f}s", flush=True)

    stats = parse_ops(newest_xplane(logdir))
    report = {"traced_nfes": 8, "wall_s": round(wall, 2),
              "note": "high-sigma guided NFE (fwd+vjp+closed-form solve), "
                      "the phase that is 97+% of bench.py's device time",
              "top_ops": [], "categories": {}}
    rows = []
    for table in stats:
        cols = [c["id"] for c in table.get("cols", [])]
        if "total_self_time" not in cols or not table.get("rows"):
            continue
        for row in table["rows"]:
            vals = {cid: cell.get("v") for cid, cell in
                    zip(cols, row["c"])}
            if str(vals.get("host_or_device", "")).lower() != "device":
                continue
            rows.append(vals)
    total_us = sum(float(r["total_self_time"]) for r in rows)
    rows.sort(key=lambda r: -float(r["total_self_time"]))
    cats = {}
    for r in rows:
        name = str(r.get("operation", "?"))
        typ = str(r.get("type", "?"))
        pct = 100 * float(r["total_self_time"]) / max(total_us, 1e-9)
        cat = categorize(typ + " " + name)
        cats[cat] = cats.get(cat, 0.0) + pct
        if len(report["top_ops"]) < 40:
            report["top_ops"].append({
                "op": name[:120], "type": typ,
                "occurrences": int(float(r.get("occurrences", 0))),
                "total_self_us": round(float(r["total_self_time"]), 1),
                "pct_device_self": round(pct, 2)})
    report["categories"] = {k: round(v, 2) for k, v in
                            sorted(cats.items(), key=lambda kv: -kv[1])}
    report["device_total_us_per_nfe"] = round(total_us / 8, 1)
    out = os.path.join(REPO, "RESULTS_PROFILE.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps(report["categories"], indent=1), flush=True)
    for o in report["top_ops"][:20]:
        print(f"{o['pct_device_self']:6.2f}%  x{o['occurrences']:<4d} "
              f"{o['type'][:28]:28s} {o['op'][:70]}", flush=True)
    print("per-NFE device self time:",
          report["device_total_us_per_nfe"], "us", flush=True)
    print("wrote", out)


if __name__ == "__main__":
    main()
