"""Aggregate a jax.profiler xplane trace into per-op device time.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
           python tools/xplane_top.py /tmp/trace_dir [top_n]

Sums event durations per op name on the TPU device planes (XLA op lines),
printing the top-N — the data the MFU work needs when tensorboard's own
converter is unavailable (the baked-in tensorboard_plugin_profile native
helper predates the installed TF).
"""

from __future__ import annotations

import glob
import sys
from collections import defaultdict


def load_spaces(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    spaces = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append((p, xs))
    return spaces


def summarize(trace_dir: str, top_n: int = 30):
    spaces = load_spaces(trace_dir)
    for path, xs in spaces:
        for plane in xs.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
            tot = defaultdict(int)
            cnt = defaultdict(int)
            for line in plane.lines:
                for ev in line.events:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    tot[name] += ev.duration_ps
                    cnt[name] += 1
            if not tot:
                continue
            print(f"\n== {plane.name}  ({path.split('/')[-1]}) ==")
            grand = sum(tot.values())
            for name, ps in sorted(tot.items(), key=lambda kv: -kv[1])[:top_n]:
                print(f"{ps/1e9:10.3f} ms  {100.0*ps/grand:5.1f}%  "
                      f"x{cnt[name]:<5d} {name[:110]}")
            print(f"{grand/1e9:10.3f} ms  total (all lines; overlapping "
                  "lines double-count)")


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
