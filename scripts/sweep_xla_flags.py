"""Sweep XLA/libtpu flags + model perf knobs over the train step.

Round-3 MFU follow-up (VERDICT round-2 item 2): the step is conv-backward
bound (fwd ~32% MFU, bwd ~1.5x fwd per FLOP), so the remaining levers are
compiler scheduling/memory flags and the equivalence-preserving model
reparams (space-to-depth stem, per-stage remat + bigger batch). XLA flags
bind at backend init, so every variant runs in its own subprocess via
scripts/profile_train.py --stages full_step.

Usage (on the real chip):
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/sweep_xla_flags.py
  [--batch 128] [--size 640] [--quick]

Prints one JSON line per variant and a ranked summary. Compiles are cached
persistently (/tmp/jax_bench_cache), so a re-run is cheap; the first run
pays one compile per variant.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (name, extra profile_train args, env overrides)
VARIANTS = [
    ("baseline", [], {}),
    ("s2d_stem", ["--s2d-stem"], {}),
    # remat frees HBM; pair it with the batch the chip couldn't fit before
    ("remat_b256", ["--remat", "--batch", "256"], {}),
    ("s2d_remat_b256", ["--s2d-stem", "--remat", "--batch", "256"], {}),
    # TPU compiler flags CANNOT ride XLA_FLAGS here: the host jaxlib's
    # parse_flags_from_env is CPU-only and hard-aborts on unknown
    # --xla_tpu_* flags (compilation happens remotely). They go through
    # profile_train --xla-opt -> lowered.compile(compiler_options=...).
    (
        "latency_hiding",
        ["--xla-opt", "xla_tpu_enable_latency_hiding_scheduler=true"],
        {},
    ),
    (
        "vmem_128m",
        ["--xla-opt", "xla_tpu_scoped_vmem_limit_kib=131072"],
        {},
    ),
    (
        "s2d_vmem_128m",
        ["--s2d-stem", "--xla-opt", "xla_tpu_scoped_vmem_limit_kib=131072"],
        {},
    ),
    # --- round-4 backward-MFU levers (VERDICT r3 Next #2) ---
    # donation halves param+opt-state HBM residency during the step; the
    # round-3 finding was that b256 fwd OOMs WITHOUT donation — retry the
    # batch ladder with it.
    ("donate_b128", ["--donate"], {}),
    ("donate_b160", ["--donate", "--batch", "160"], {}),
    ("donate_b192", ["--donate", "--batch", "192"], {}),
    ("donate_b256", ["--donate", "--batch", "256"], {}),
    ("donate_remat_b256", ["--donate", "--remat", "--batch", "256"], {}),
    # --- round-5 levers ---
    # loss candidate-gather lowering: cells-indexed gather avoids the
    # (B, H*W*A, 85) reshape relayout copies (~16 ms/step in the r5 trace)
    ("gather_cells", ["--gather-mode", "cells"], {}),
    (
        "gather_cells_latency_hiding",
        ["--gather-mode", "cells",
         "--xla-opt", "xla_tpu_enable_latency_hiding_scheduler=true"],
        {},
    ),
    # width-vs-MFU diagnostics: same step/loss, wider convs. If MFU climbs
    # with base_width (s=32 -> m=48 -> l=64), the v5s residual is
    # narrow-channel MXU occupancy (conv-algorithm-bound), not scheduling.
    ("diag_yolov5m", ["--model", "yolov5m"], {}),
    ("diag_yolov5l", ["--model", "yolov5l", "--batch", "64"], {}),
]


def run_variant(name, extra, env_over, batch, size, timeout):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    for k, v in env_over.items():
        env[k] = (env.get(k, "") + " " + v).strip() if k == "XLA_FLAGS" else v
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "profile_train.py"),
        "--stages", "full_step", "--size", str(size),
    ]
    if "--batch" not in extra:
        cmd += ["--batch", str(batch)]
    cmd += extra
    try:
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"variant": name, "error": f"timeout after {timeout}s"}
    if out.returncode != 0:
        return {"variant": name,
                "error": (out.stderr or out.stdout).strip()[-400:]}
    result = {"variant": name}
    for ln in out.stdout.splitlines():
        if not ln.startswith("{"):
            continue
        d = json.loads(ln)
        if d.get("stage") == "full_step":
            result.update(ms=d["ms"], img_s=d["img_s"])
        if d.get("stage") == "mfu_full_step_3x":
            result["mfu"] = d["value"]
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--timeout", type=int, default=2400,
                    help="per-variant wall cap (first run compiles)")
    ap.add_argument("--quick", action="store_true",
                    help="only baseline + the two model reparams")
    ap.add_argument("--only", default=None,
                    help="comma list of variant names to run")
    args = ap.parse_args()

    chosen = VARIANTS
    if args.quick:
        chosen = [v for v in VARIANTS
                  if v[0] in ("baseline", "s2d_stem", "s2d_remat_b256")]
    if args.only:
        names = set(args.only.split(","))
        chosen = [v for v in VARIANTS if v[0] in names]

    results = []
    for name, extra, env_over in chosen:
        print(f"# running {name} ...", file=sys.stderr)
        r = run_variant(name, extra, env_over, args.batch, args.size,
                        args.timeout)
        print(json.dumps(r))
        sys.stdout.flush()
        results.append(r)

    ok = [r for r in results if "img_s" in r]
    if ok:
        best = max(ok, key=lambda r: r["img_s"])
        print(json.dumps({"summary": "best", **best}))


if __name__ == "__main__":
    main()
