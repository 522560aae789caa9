"""Bucket an xplane trace's device op time by op-category (standalone summary).

Usage: python scripts/xplane_buckets.py <trace.xplane.pb> [iters]

Groups the sync 'XLA Ops' line by sanitized base name (trailing .NNN instance
ids stripped), excluding outer while/call wrappers whose children are counted
separately, and prints a category rollup (pallas kernels, convolutions,
layout/copy ops, pads, selects, reductions, ...).
"""
import collections
import re
import sys


def main(path, iters=1.0):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            tot = collections.Counter()
            cnt = collections.Counter()
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                name = md.display_name or md.name
                base = re.sub(r"[.]\d+$", "", name)
                if base in ("while", "conditional", "call"):
                    continue  # wrappers: children are their own events
                tot[base] += ev.duration_ps
                cnt[base] += 1
            T = sum(tot.values())
            print(f"== {plane.name} total (excl. wrappers): "
                  f"{T/1e12/iters*1e3:.1f} ms/iter ==")
            for k, v in tot.most_common(40):
                print(f"  {v/1e12/iters*1e3:9.2f} ms {100*v/T:5.1f}% "
                      f"x{cnt[k]:6d}  {k}")
            cat = collections.Counter()
            for k, v in tot.items():
                if k.startswith("closed_call") or "custom-call" in k:
                    c = "pallas kernels"
                elif k.startswith(("convolution", "conv")):
                    c = "xla convolutions"
                elif k.startswith(("copy", "transpose", "bitcast", "reshape")):
                    c = "layout copies"
                elif k.startswith("dynamic_update_slice"):
                    c = "accumulator RMW"
                elif k.startswith("dynamic_slice"):
                    c = "tile slice"
                elif k.startswith("pad") or "pad" in k:
                    c = "pads"
                elif k.startswith("rev"):
                    c = "TTA flips (rev)"
                elif "compare_select" in k or k.startswith("select"):
                    c = "selects (lrelu)"
                elif k.startswith(("reduce", "all-reduce")) or "reduce" in k:
                    c = "reductions (norm)"
                elif k.startswith("convert") or "convert" in k:
                    c = "dtype converts"
                elif k.startswith("concatenate") or "concat" in k:
                    c = "concats"
                elif k.startswith("fusion") or "fusion" in k:
                    c = "other fusions"
                else:
                    c = "misc"
                cat[c] += v
            print("-- categories --")
            for k, v in cat.most_common():
                print(f"  {v/1e12/iters*1e3:9.2f} ms {100*v/T:5.1f}%  {k}")


if __name__ == "__main__":
    main(sys.argv[1], float(sys.argv[2]) if len(sys.argv) > 2 else 1.0)
