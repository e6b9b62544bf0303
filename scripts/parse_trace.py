"""Summarize a jax.profiler trace (xplane.pb) into a per-op time table.

Usage: python scripts/parse_trace.py /tmp/jax-trace/plugins/profile/<run>/

Groups XLA HLO ops by fusion/op name prefix and prints the top-N by total
device time — the per-layer evidence for the train-step MFU analysis
(STATUS.md round 3).
"""

import sys
from collections import defaultdict
from pathlib import Path


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


def find_xplane(root):
    hits = sorted(Path(root).rglob("*.xplane.pb"))
    if not hits:
        raise SystemExit(f"no .xplane.pb under {root}")
    return hits[-1]


def main():
    xplane_pb2 = _import_xplane_pb2()

    path = find_xplane(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax-trace")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(path.read_bytes())

    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        op_time = defaultdict(float)
        op_count = defaultdict(int)
        total = 0.0
        for line in plane.lines:
            # XLA op lines carry per-op events; timestamps in ps
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                name = meta.name
                dur_us = ev.duration_ps / 1e6
                op_time[name] += dur_us
                op_count[name] += 1
                total += dur_us
        if not op_time:
            continue
        print(f"== plane: {plane.name}  (sum of op-events {total/1e3:.2f} ms"
              f" across all lines)")
        rows = sorted(op_time.items(), key=lambda kv: -kv[1])[:40]
        for name, us in rows:
            print(f"{us/1e3:9.3f} ms  x{op_count[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
