"""Per-op roofline attribution for the yolov5s train step (VERDICT r3 #2).

Two passes:

1. STATIC — lower + compile the exact bench train step (b128@640 bf16,
   same construction as bench._bench_train_step), parse the optimized HLO
   for every convolution op (fwd convs, grad-filter convs, grad-input
   convs are all `convolution` at HLO level), and compute each op's FLOPs
   from its shapes/window. Written to --out (json).

2. TRACE MERGE (optional) — given a jax.profiler trace dir (produced by
   `scripts/profile_train.py --trace DIR` or --trace here), match XLA op
   events to the HLO convs by instruction name and print the roofline
   table: time, FLOPs, achieved TFLOP/s, % of the v5e 197 TFLOP/s bf16
   peak. Ops that don't match a conv aggregate into fusion/other rows.

Usage:
  python scripts/hlo_roofline.py --static-only          # HLO conv table
  python scripts/hlo_roofline.py --trace /tmp/jax-trace # capture + merge
"""

import argparse
import json
import os
import re
import sys
from collections import defaultdict
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np

PEAK_TFLOPS = 197.0  # v5e bf16

SHAPE_RE = re.compile(r"(bf16|f32|f16|s8|u8|s32)\[([\d,]*)\]")
CONV_RE = re.compile(
    r"%?([\w.\-]+) = (bf16|f32)\[([\d,]+)\][^=]*convolution\("
)


def _dims(s):
    return [int(x) for x in s.split(",") if x]


DEF_RE = re.compile(r"^(?:ROOT )?%?([\w.\-]+) = (bf16|f32|f16|s8|u8|s32|u32|pred)\[([\d,]*)\]")
OPERANDS_RE = re.compile(r"convolution\(%?([\w.\-]+), %?([\w.\-]+)\)")


def _win_vec(window, key, ndims, default):
    m = re.search(rf"{key}=([\dx_]+)", window)
    if not m:
        return [default] * ndims
    return [int(x) for x in m.group(1).split("x")]


def _pad_vec(window, ndims):
    m = re.search(r"pad=([\d_x\-]+)", window)
    if not m:
        return [(0, 0)] * ndims
    return [tuple(int(v) for v in d.split("_")) for d in m.group(1).split("x")]


def _valid_pairs(L, W, stride, pad_lo, ldil, rdil, O):
    """Number of (output position, window tap) pairs that touch real lhs
    data — i.e. in-bounds and not a lhs_dilation hole. This is the true MAC
    count per (contracted-feature, batch x out-feature) slice, exact for the
    operand-swapped / dilated grad convs XLA emits for conv backward."""
    span = (L - 1) * ldil + 1 if L > 0 else 0
    total = 0
    for o in range(O):
        base = o * stride - pad_lo
        for k in range(W):
            pos = base + k * rdil
            if 0 <= pos < span and pos % ldil == 0:
                total += 1
    return total


def conv_flops(dim_labels, window, lhs, rhs, out):
    """Exact MAC-based FLOPs for one HLO convolution, robust to the
    backward-pass forms (huge symmetric padding with a tiny lhs, lhs/rhs
    dilation): 2 * contracted_features * (batch x out-features) *
    prod_over_spatial_dims(valid (o, k) pairs)."""
    try:
        lhs_l, rest = dim_labels.split("_")
        rhs_l, out_l = rest.split("->")
    except ValueError:
        return 0
    ndims = sum(ch.isdigit() for ch in out_l)
    lhs_sp = [lhs[pos] for pos, ch in enumerate(lhs_l) if ch.isdigit()]
    win_sp = [rhs[pos] for pos, ch in enumerate(rhs_l) if ch.isdigit()]
    out_sp = [out[pos] for pos, ch in enumerate(out_l) if ch.isdigit()]
    cin = next((rhs[pos] for pos, ch in enumerate(rhs_l) if ch == "i"), 1)
    strides = _win_vec(window, "stride", ndims, 1)
    ldils = _win_vec(window, "lhs_dilate", ndims, 1)
    rdils = _win_vec(window, "rhs_dilate", ndims, 1)
    pads = _pad_vec(window, ndims)
    pairs = 1
    for d in range(ndims):
        pairs *= _valid_pairs(lhs_sp[d], win_sp[d], strides[d], pads[d][0],
                              ldils[d], rdils[d], out_sp[d])
    non_spatial = int(np.prod(out)) // max(int(np.prod(out_sp)), 1)
    return 2 * cin * non_spatial * pairs


def parse_conv_ops(hlo_text):
    """Extract every HLO convolution: name, output shape, operand shapes,
    window string, dim_labels, feature_group_count -> FLOPs.

    Optimized HLO text references operands by bare name (no inline shapes),
    so this is two-pass: first a name->shape symbol table over every
    instruction definition, then conv lines resolve (lhs, rhs) through it."""
    shapes_by_name = {}
    for line in hlo_text.splitlines():
        dm = DEF_RE.match(line.strip())
        if dm:
            shapes_by_name[dm.group(1)] = _dims(dm.group(3))
    ops = []
    for line in hlo_text.splitlines():
        line = line.strip()
        m = CONV_RE.search(line)
        if not m or " convolution(" not in line:
            continue
        name, odtype, oshape = m.group(1), m.group(2), _dims(m.group(3))
        om = OPERANDS_RE.search(line)
        if not om:
            continue
        lhs = shapes_by_name.get(om.group(1), [])
        rhs = shapes_by_name.get(om.group(2), [])
        if not rhs:
            continue
        dl = re.search(r"dim_labels=(\S+?)(,|$| )", line)
        dim_labels = dl.group(1) if dl else "?"
        fg = re.search(r"feature_group_count=(\d+)", line)
        groups = int(fg.group(1)) if fg else 1
        win = re.search(r"window={([^}]*)}", line)
        window = win.group(1) if win else ""
        flops = conv_flops(dim_labels, window, lhs, rhs, oshape)
        out_elems = int(np.prod(oshape))
        ops.append({
            "name": name, "flops": flops, "out": oshape, "lhs": lhs,
            "rhs": rhs, "dim_labels": dim_labels, "groups": groups,
            "window": window, "dtype": odtype,
        })
    return ops


def build_step():
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench  # noqa: F401  (reuses its env knobs/model setup)
    import jax
    import jax.numpy as jnp

    from yoloseries_tpu.losses.yolov5 import YOLOv5LossConfig
    from yoloseries_tpu.models import create_model
    from yoloseries_tpu.ops import YOLOV5_ANCHORS
    from yoloseries_tpu.train import (
        OptimizerConfig, build_optimizer, create_train_state, make_train_step,
    )

    batch = int(os.environ.get("BENCH_TRAIN_BATCH", 128))
    size, nc = 640, 80
    model = create_model("yolov5s", num_class=nc, dtype=jnp.bfloat16)
    cfg = OptimizerConfig(batch_size=batch, total_epochs=2, steps_per_epoch=4,
                          do_warmup=False)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False
    )
    tx = build_optimizer(cfg, variables["params"])
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               (1, size, size, 3))
    loss_cfg = YOLOv5LossConfig(num_class=nc, input_size=(size, size))
    step = make_train_step(loss_cfg, YOLOV5_ANCHORS, accumulate=1,
                           compute_dtype=jnp.bfloat16, donate=False)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.integers(0, 255, (batch, size, size, 3), np.uint8))
    ann = np.full((batch, 60, 6), -1, np.float32)
    ann[:, :8, :4] = rng.uniform(10, 600, (batch, 8, 4))
    ann[:, :8, 2:4] += ann[:, :8, :2]
    ann[:, :8, 4] = rng.integers(0, nc, (batch, 8))
    ann[:, :8, 5] = np.arange(batch)[:, None]
    batch_d = {"img": img, "ann": jnp.asarray(ann)}
    return step, state, batch_d, batch


def _import_xplane_pb2():
    """xplane proto lives in different packages across versions; try each."""
    import importlib
    for mod in ("tensorflow.tsl.profiler.protobuf.xplane_pb2",
                "tensorboard_plugin_profile.protobuf.xplane_pb2",
                "tsl.profiler.protobuf.xplane_pb2"):
        try:
            return importlib.import_module(mod)
        except ImportError:
            continue
    raise SystemExit("no xplane_pb2 proto module available")


def trace_op_times(trace_dir):
    """instruction name -> (total_us, count) from the newest xplane in
    trace_dir. Only the synchronous 'XLA Ops' line counts — 'Async XLA Ops'
    events overlap compute (DMA prefetch) and would double-count walltime."""
    xplane_pb2 = _import_xplane_pb2()

    hits = sorted(Path(trace_dir).rglob("*.xplane.pb"))
    if not hits:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(hits[-1].read_bytes())
    out = defaultdict(lambda: [0.0, 0])
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                # event names are full definitions: '%fusion.1 = bf16[...'
                name = meta.name.lstrip("%").split(" = ")[0]
                rec = out[name]
                rec[0] += ev.duration_ps / 1e6
                rec[1] += 1
    return {k: (v[0], v[1]) for k, v in out.items()}


COMPUTATION_RE = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*\(")
FUSION_CALLS_RE = re.compile(r"calls=%?([\w.\-]+)")


def map_fusions_to_convs(hlo_text, convs):
    """instruction name -> list of conv dicts it executes. Top-level convs
    map to themselves; fusion instructions map to the convolution ops inside
    their called computation."""
    conv_by_name = {c["name"]: c for c in convs}
    convs_in_comp = defaultdict(list)
    current = None
    for raw in hlo_text.splitlines():
        line = raw.strip()
        if raw and not raw.startswith(" "):
            cm = COMPUTATION_RE.match(line)
            if cm:
                current = cm.group(1)
                continue
        m = CONV_RE.search(line)
        if m and " convolution(" in line and current:
            c = conv_by_name.get(m.group(1))
            if c:
                convs_in_comp[current].append(c)
    inst_convs = {}
    name_re = re.compile(r"^(?:ROOT )?%?([\w.\-]+) = ")
    for raw in hlo_text.splitlines():
        line = raw.strip()
        if " fusion(" not in line:
            continue
        dm = name_re.match(line)
        fm = FUSION_CALLS_RE.search(line)
        if dm and fm and fm.group(1) in convs_in_comp:
            inst_convs[dm.group(1)] = convs_in_comp[fm.group(1)]
    for c in convs:
        inst_convs.setdefault(c["name"], [c])
    return inst_convs


def categorize(name):
    base = name.split(".")[0]
    if base in ("copy", "reshape", "bitcast", "transpose", "copy-start",
                "copy-done"):
        return "layout/copy"
    if "reduce" in base:
        return "reductions"
    if base in ("fusion",) or "fusion" in base:
        return "fusions(elementwise)"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--static-only", action="store_true")
    ap.add_argument("--trace", default=None,
                    help="dir: capture a 2-step trace there, then merge")
    ap.add_argument("--merge-only", default=None,
                    help="existing trace dir to merge (skip capture)")
    ap.add_argument("--out", default="docs/mfu_conv_inventory.json")
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    step, state, batch_d, batch = build_step()
    import jax

    lowered = step.lower(state, batch_d)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    convs = parse_conv_ops(hlo)
    total_conv_flops = sum(c["flops"] for c in convs)
    ca = compiled.cost_analysis()
    ca_flops = (ca or {}).get("flops", 0.0)
    print(f"# {len(convs)} HLO convolutions, {total_conv_flops/1e12:.3f} "
          f"TFLOP/step (cost_analysis total: {ca_flops/1e12:.3f} TFLOP)")
    convs.sort(key=lambda c: -c["flops"])
    for c in convs[:999]:
        print(f"{c['flops']/1e9:9.2f} GF  {c['name'][:46]:46s} "
              f"lhs{c['lhs']} rhs{c['rhs']} g{c['groups']} {c['window'][:40]}")
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(
        {"batch": batch, "total_conv_flops": total_conv_flops,
         "cost_analysis_flops": ca_flops, "convs": convs}, indent=1))
    print(f"wrote {args.out}")
    if args.static_only:
        return

    trace_dir = args.merge_only
    if trace_dir is None:
        trace_dir = args.trace or "/tmp/jax-trace-roofline"
        # warm/compile then trace N steps
        st = state
        st, _ = step(st, batch_d)
        jax.block_until_ready(st.params)
        with jax.profiler.trace(trace_dir):
            for _ in range(args.steps):
                st, m = step(st, batch_d)
            jax.block_until_ready(st.params)

    times = trace_op_times(trace_dir)
    inst_convs = map_fusions_to_convs(hlo, convs)
    rows, conv_us, cat_us = [], 0.0, defaultdict(float)
    total_us = sum(us for us, _ in times.values())
    for name, (us, cnt) in times.items():
        cs = inst_convs.get(name)
        if cs:
            flops = sum(c["flops"] for c in cs)
            per_call = us / max(cnt, 1)
            tf = flops / (per_call * 1e-6) / 1e12 if per_call else 0.0
            rows.append((us / max(cnt, 1), name, cs, tf))
            conv_us += us
        else:
            cat_us[categorize(name)] += us
    steps = max((cnt for _, cnt in times.values()), default=1)
    rows.sort(key=lambda r: -r[0])
    report = []
    report.append(
        f"== trace ({steps} steps): total {total_us/steps/1e3:.2f} ms/step — "
        f"conv {conv_us/steps/1e3:.2f} ms, "
        + ", ".join(f"{k} {v/steps/1e3:.2f} ms"
                    for k, v in sorted(cat_us.items(), key=lambda kv: -kv[1]))
    )
    conv_flops_matched = sum(sum(c["flops"] for c in cs) for _, _, cs, _ in rows)
    if conv_us:
        report.append(
            f"== conv-only efficiency: {conv_flops_matched/1e12:.3f} TFLOP in "
            f"{conv_us/steps/1e3:.2f} ms/step = "
            f"{conv_flops_matched/(conv_us/steps*1e-6)/1e12:.1f} TFLOP/s "
            f"({100*conv_flops_matched/(conv_us/steps*1e-6)/1e12/PEAK_TFLOPS:.1f}% "
            f"of {PEAK_TFLOPS:.0f} bf16 peak)"
        )
    report.append(f"{'ms/step':>8} {'GFLOP':>8} {'TFLOP/s':>8} {'%peak':>6}  op")
    for per_us, name, cs, tf in rows[:48]:
        c = max(cs, key=lambda c: c["flops"])
        report.append(
            f"{per_us/1e3:8.3f} {sum(x['flops'] for x in cs)/1e9:8.1f} "
            f"{tf:8.1f} {100*tf/PEAK_TFLOPS:6.1f}  "
            f"{name[:40]:40s} out{c['out']} rhs{c['rhs']} {c['window'][:36]}"
        )
    txt = "\n".join(report)
    print("\n" + txt)
    md_path = Path("docs/mfu_roofline.md")
    hdr = (f"# Per-op roofline: yolov5s train step (b{batch}@640 bf16)\n\n"
           f"Generated by `scripts/hlo_roofline.py --trace ...` on the real "
           f"v5e chip.\njaxlib {__import__('jaxlib').__version__}, "
           f"jax {__import__('jax').__version__}.\n\n```\n")
    md_path.write_text(hdr + txt + "\n```\n")
    print(f"wrote {md_path}")


if __name__ == "__main__":
    main()
