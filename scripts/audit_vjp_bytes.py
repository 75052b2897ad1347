#!/usr/bin/env python
"""Per-buffer byte audit of the guided-NFE fwd+vjp program (VERDICT r4 #4).

The flagship workload is HBM-bound (RESULTS_ROOFLINE.json: fwd+vjp moves
13.39 GB at 256px; ~8.6 GB over the fwd-only program). This script compiles
ONE guided NFE (model fwd + x-vjp — the unit bench.py's MFU accounting
scales) on the real chip, walks the optimized HLO, and tables where the
bytes actually live:

  - every instruction output >= --min-mb, with dtype / shape / producer op;
  - totals grouped by dtype and by op kind;
  - the f32 share — any large f32 buffer in a bf16-torso program is a
    candidate for bf16 storage or recompute-in-bwd.

Optionally audits a second variant with a remat policy (--policy
conv_dots) that saves only conv/dot outputs and rematerializes elementwise
chains (GroupNorm stats, SiLU, converts) in the backward pass, for an
A/B of the byte stream. Writes RESULTS_VJP_AUDIT.json.

Run on the chip: python scripts/audit_vjp_bytes.py
"""

import argparse
import json
import os
import re
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8, "c64": 8,
               "c128": 16}

# %name = dtype[d0,d1,...]{layout} opcode(...)
_INSTR = re.compile(
    r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+(\w+)\[([\d,]*)\][^ ]*\s+([\w\-]+)\(")


_COMP = re.compile(r"^(ENTRY\s+)?%?([\w.\-]+)\s*(?:\([^)]*\))?\s*->.*{")


def parse_hlo(txt, min_bytes):
    """Instruction-level output-buffer stats from optimized HLO text.

    Only instructions in non-fusion computations are counted: values inside
    %fused_computation.* / %region_* bodies never materialize in HBM, so
    counting them would wildly over-state traffic. What remains (the entry
    computation plus call/while bodies) is exactly the set of HBM buffer
    writes the scheduler works with."""
    rows = []
    by_dtype = defaultdict(int)
    by_op = defaultdict(int)
    total = 0
    in_hbm_comp = True
    # (index, name, nbytes, dtype, op, dims) in schedule order (the module
    # prints is_scheduled=true, so text order == execution order)
    sched = []
    uses = defaultdict(int)  # name -> last schedule index that reads it
    use_re = re.compile(r"%([\w.\-]+)")
    for line in txt.splitlines():
        mc = _COMP.match(line)
        if mc:
            name = mc.group(2)
            in_hbm_comp = not (name.startswith("fused_")
                               or name.startswith("region_")
                               or ".clone" in name)
            continue
        if not in_hbm_comp:
            continue
        m = _INSTR.match(line)
        if not m:
            continue
        name, dtype, dims, op = m.groups()
        idx = len(sched)
        # record operand uses (everything after the '=')
        rhs = line.split("=", 1)[1]
        for operand in use_re.findall(rhs):
            uses[operand] = idx
        if dtype not in DTYPE_BYTES:
            continue
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast"):
            continue  # not new buffers
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        nbytes = n * DTYPE_BYTES[dtype]
        total += nbytes
        by_dtype[dtype] += nbytes
        by_op[op] += nbytes
        sched.append((idx, name, nbytes, dtype, op, dims))
        if nbytes >= min_bytes:
            rows.append({"name": name, "dtype": dtype,
                         "shape": f"[{dims}]", "op": op,
                         "mb": round(nbytes / 1e6, 1)})
    n_sched = len(sched)
    # residual-like: big buffers whose last use is far from their def —
    # written in the fwd half, read in the bwd half
    residuals = []
    resid_bytes = resid_bytes_f32 = 0
    for idx, name, nbytes, dtype, op, dims in sched:
        span = uses.get(name, idx) - idx
        if nbytes >= min_bytes and span > n_sched * 0.2:
            residuals.append({"name": name, "dtype": dtype,
                              "shape": f"[{dims}]", "op": op,
                              "mb": round(nbytes / 1e6, 1),
                              "live_span_pct": round(100 * span / n_sched)})
            resid_bytes += nbytes
            if dtype == "f32":
                resid_bytes_f32 += nbytes
    residuals.sort(key=lambda r: -r["mb"])
    rows.sort(key=lambda r: -r["mb"])
    return {"instruction_output_bytes_gb": round(total / 1e9, 2),
            "by_dtype_gb": {k: round(v / 1e9, 3)
                            for k, v in sorted(by_dtype.items(),
                                               key=lambda kv: -kv[1])},
            "by_op_gb": {k: round(v / 1e9, 3)
                         for k, v in sorted(by_op.items(),
                                            key=lambda kv: -kv[1])[:15]},
            "long_lived_gb": round(resid_bytes / 1e9, 3),
            "long_lived_f32_gb": round(resid_bytes_f32 / 1e9, 3),
            "long_lived_buffers": residuals[:40],
            "top_buffers": rows[:40]}


def precast_torso_params(params):
    """Casts every non-GroupNorm param to bf16 AT THE TREE LEVEL — the exact
    cast flax's promote_dtype performs per use-site anyway (numerically
    identical), but done once where XLA can hoist it out of the sampling
    scan. The per-use-site converts fuse into the weight-packing
    custom-calls (ConcatBitcast), which then run in f32 (the audit found
    ~0.5 GB/NFE of f32 weight packs in a bf16 torso); a pre-cast tree makes
    those packs bf16. GroupNorm scale/bias stay f32 (f32-statistics
    contract, matching the reference's GroupNorm32)."""
    import jax
    import jax.numpy as jnp

    def cast(path, x):
        if any(getattr(k, "key", "") == "GroupNorm_0" for k in path):
            return x
        return x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x

    return jax.tree_util.tree_map_with_path(cast, params)


def build_nfe(policy_name):
    import jax
    import jax.numpy as jnp

    from kdip_tpu.models import adm

    model = adm.ffhq_unet(dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)),
                        jnp.zeros((1,)))["params"]

    if policy_name == "precast_bf16":
        params = precast_torso_params(params)
        policy_name = None

    def model_apply(p, x, t):
        return model.apply({"params": p}, x, t.astype(jnp.float32))

    policy = None
    if policy_name == "conv_dots":
        # save only MXU-op outputs; recompute elementwise (norm applies,
        # SiLU, converts) in the bwd — the cheap-to-recompute residuals
        # are exactly the byte-heavy ones
        def policy(prim, *_, **__):
            return prim.name in ("conv_general_dilated", "dot_general")
    elif policy_name:
        policy = getattr(jax.checkpoint_policies, policy_name)

    def one_nfe(p, x, sigma):
        def f(xx):
            return model_apply(p, xx, jnp.broadcast_to(sigma, (1,)))
        if policy is not None:
            f = jax.checkpoint(f, policy=policy)
        y, vjp = jax.vjp(f, x)
        return y, vjp(jnp.ones_like(y))

    return one_nfe, params


def audit(policy_name, min_mb, time_it=True):
    import time

    import jax
    import jax.numpy as jnp

    fn, params = build_nfe(policy_name)
    x = jnp.zeros((1, 256, 256, 3))
    sig = jnp.float32(1.0)
    comp = jax.jit(fn).lower(params, x, sig).compile()
    c = comp.cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    ma = comp.memory_analysis()
    rec = parse_hlo(comp.as_text(), min_mb * 1e6)
    rec["cost_analysis"] = {
        "flops_g": round(float(c.get("flops", 0)) / 1e9, 1),
        "bytes_accessed_gb": round(float(c.get("bytes accessed", 0)) / 1e9,
                                   2)}
    rec["memory_analysis_mb"] = {
        "temp": round(ma.temp_size_in_bytes / 1e6, 1),
        "args": round(ma.argument_size_in_bytes / 1e6, 1)}
    if time_it:
        jitted = jax.jit(fn)
        out = jax.block_until_ready(jitted(params, x, sig))
        n = 30
        t0 = time.time()
        for _ in range(n):
            out = jitted(params, x, sig)
        jax.block_until_ready(out)
        ms = (time.time() - t0) / n * 1e3
        rec["wall_ms"] = round(ms, 2)
        rec["tflops_sustained"] = round(
            float(c.get("flops", 0)) / 1e9 / ms, 1)
    return rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--min-mb", type=float, default=8.0)
    p.add_argument("--policies", default=",conv_dots,precast_bf16",
                   help="comma list; empty entry = no policy (baseline)")
    p.add_argument("--out", default=os.path.join(REPO,
                                                 "RESULTS_VJP_AUDIT.json"))
    args = p.parse_args()

    from kdip_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    doc = {"config": "one guided NFE (fwd + x-vjp), FFHQ-256 bf16 torso, "
                     "batch 1, v5e",
           "variants": {}}
    for pol in args.policies.split(","):
        name = pol or "baseline"
        print(f"=== auditing {name} ===", flush=True)
        doc["variants"][name] = audit(pol, args.min_mb)
        print(json.dumps({k: v for k, v in doc["variants"][name].items()
                          if k != "top_buffers"}, indent=1), flush=True)
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
