"""Parse a `jax.profiler.trace` xplane dump and print where device time goes.

The tensorboard-plugin-profile converter is broken in this image
(CLAUDE.md "Environment gotchas"), so this parses the `.xplane.pb`
directly: it aggregates the "XLA Ops" line's event durations by op
metadata name and prints the top-N, plus the device-busy total.

Usage:
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python tools/xprof.py /tmp/trace_dir [--top 25]

(`jax.profiler.trace(dir)` writes
 <dir>/plugins/profile/<run>/<host>.xplane.pb)
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys


def find_xplane(root: str) -> str:
    hits = sorted(glob.glob(os.path.join(root, "**", "*.xplane.pb"),
                            recursive=True))
    if not hits:
        sys.exit(f"no .xplane.pb under {root}")
    return hits[-1]   # latest run


def aggregate(path: str):
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    per_op = collections.Counter()          # name -> total ps
    per_op_n = collections.Counter()        # name -> event count
    busy_ps = 0
    for plane in space.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                per_op[name] += ev.duration_ps
                per_op_n[name] += 1
                busy_ps += ev.duration_ps
    return per_op, per_op_n, busy_ps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    path = find_xplane(args.trace_dir)
    per_op, per_op_n, busy_ps = aggregate(path)
    print(f"# {path}")
    print(f"device busy total: {busy_ps / 1e9:.3f} ms")
    for name, ps in per_op.most_common(args.top):
        print(f"{ps / 1e9:9.3f} ms  {per_op_n[name]:5d}x  {name}")


if __name__ == "__main__":
    main()
