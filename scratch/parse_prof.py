"""Aggregate XLA op times from an xplane.pb trace into categories."""

import collections
import glob
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2

f = sorted(glob.glob("/tmp/prof/**/*.xplane.pb", recursive=True))[-1]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(f, "rb").read())
plane = [p for p in xs.planes if p.name == "/device:TPU:0"][0]
emeta = plane.event_metadata
smeta = plane.stat_metadata

line = [l for l in plane.lines if l.name == "XLA Ops"][0]
tot = collections.Counter()
cnt = collections.Counter()
raw = collections.Counter()


def category(name: str) -> str:
    n = name.lower()
    if "fusion" in n:
        return "fusion"
    for key in (
        "gather", "scatter", "sort", "convolution", "dot", "copy",
        "dynamic-slice", "dynamic-update-slice", "reduce", "iota",
        "concatenate", "broadcast", "select", "transpose", "slice",
        "bitcast", "all-reduce", "while", "cumsum", "pad", "compare",
        "convert", "add", "multiply", "reshape", "tuple", "parameter",
    ):
        if key in n:
            return key
    return "other"


for ev in line.events:
    name = emeta[ev.metadata_id].name
    dur = ev.duration_ps / 1e9  # ms
    raw[name] += dur
    tot[category(name)] += dur
    cnt[category(name)] += 1

total = sum(tot.values())
print(f"total XLA op time (3 iters): {total:.1f} ms  => {total/3:.1f} ms/iter")
for k, v in tot.most_common(25):
    print(f"  {k:22s} {v/3:8.2f} ms/iter  ({cnt[k]} events)")

print("\ntop individual ops:")
for name, v in raw.most_common(40):
    print(f"  {v/3:8.3f} ms/iter  {name[:120]}")

print("\nby-shape buckets (fusion/copy events):")
bucket = collections.Counter()
bcnt = collections.Counter()
for name, dur in raw.items():
    m = re.search(r"= ([a-z0-9]+\[[0-9,]*\])", name)
    shape = m.group(1) if m else "?"
    op = name.split("=")[1].strip().split(" ")[1].split("(")[0] if "=" in name else "?"
    bucket[(op, shape)] += dur
    bcnt[(op, shape)] += 1
for (op, shape), v in bucket.most_common(45):
    print(f"  {op:12s} {shape:24s} {v/3:8.3f} ms/iter  x{bcnt[(op,shape)]}")
