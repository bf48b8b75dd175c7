"""Summarize an XProf trace into a per-op table (VERDICT r4 item 5).

`cli sample --trace-dir` captures one warm trajectory as an XSpace
protobuf (plugins/profile/<run>/*.xplane.pb). The environment has no
tensorflow / tensorboard_plugin_profile to read it, so this module
carries a ~60-line generic protobuf wire-format decoder and the xplane
schema field numbers (tensorflow/core/profiler/protobuf/xplane.proto):

  XSpace.planes=1 ; XPlane{name=2, lines=3, event_metadata=4(map),
  stat_metadata=5} ; XLine{name=2, display_name=11, events=4} ;
  XEvent{metadata_id=1, duration_ps=3} ; XEventMetadata{id=1, name=2,
  display_name=4} ; map entries {key=1, value=2}.

It aggregates total device time per op (event metadata name) on the TPU
device plane's XLA-op lines, buckets ops by kind (convolution / fusion /
custom-call / copy-transpose-reshape / other), and prints the top-N table
— the measurement the analytic `structural_roundtrips` table in
results_roofline_v5e.json is reconciled against.

Usage: python benchmarks/trace_summary.py --trace-dir /tmp/trace \
           [--top 25] [--json results_trace_sd_v5e.json]
"""

import argparse
import glob
import json
import os
import sys
from collections import defaultdict

# ---------------------------------------------------------------- wire format


def _varint(buf, i):
    x = s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def decode(buf, start=0, end=None):
    """Generic protobuf decode: {field_number: [values]}; length-delimited
    values stay bytes (caller decides submessage vs string)."""
    out = defaultdict(list)
    i = start
    end = len(buf) if end is None else end
    while i < end:
        key, i = _varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _varint(buf, i)
        elif wire == 1:
            v, i = buf[i:i + 8], i + 8
        elif wire == 2:
            ln, i = _varint(buf, i)
            v, i = buf[i:i + ln], i + ln
        elif wire == 5:
            v, i = buf[i:i + 4], i + 4
        else:
            raise ValueError(f"wire type {wire} at {i}")
        out[field].append(v)
    return out


def _sub(msg, field):
    return [decode(b) for b in msg.get(field, [])]


def _str(msg, field, default=""):
    vals = msg.get(field, [])
    return vals[0].decode("utf-8", "replace") if vals else default


def _int(msg, field, default=0):
    vals = msg.get(field, [])
    return vals[0] if vals else default


# ------------------------------------------------------------------- xplane


def parse_xspace(path):
    with open(path, "rb") as f:
        space = decode(f.read())
    return _sub(space, 1)  # planes


def device_op_table(planes):
    """{op_name: [total_ps, count]} over the XLA-op lines of TPU device
    planes (plane names '/device:TPU:N'; host/python planes skipped)."""
    table = defaultdict(lambda: [0, 0])
    categories = {}
    plane_names = []
    for plane in planes:
        pname = _str(plane, 2)
        plane_names.append(pname)
        if "TPU" not in pname or "device:" not in pname.lower():
            continue
        # stat metadata map (for hlo_category lookups)
        stat_names = {}
        for entry in _sub(plane, 5):
            vm = _sub(entry, 2)
            if vm:
                stat_names[_int(entry, 1)] = _str(vm[0], 2)
        # event metadata map: entry {key=1 varint, value=2 XEventMetadata}
        meta = {}
        for entry in _sub(plane, 4):
            em = _sub(entry, 2)
            if em:
                name = _str(em[0], 4) or _str(em[0], 2)
                meta[_int(entry, 1)] = name
                for st in _sub(em[0], 5):  # metadata-level stats
                    if stat_names.get(_int(st, 1)) == "hlo_category":
                        categories[name] = _str(st, 5)
        for line in _sub(plane, 3):
            lname = _str(line, 11) or _str(line, 2)
            # ONLY the synchronous per-op line: 'XLA Modules' events are
            # whole-program envelopes and 'Async XLA Ops' are DMA-queue
            # copies that overlap compute — both double-count
            if lname != "XLA Ops":
                continue
            for ev in _sub(line, 4):
                mid = _int(ev, 1)
                dur = _int(ev, 3)
                name = meta.get(mid, f"op#{mid}")
                row = table[name]
                row[0] += dur
                row[1] += 1
    return table, categories, plane_names


def bucket(name):
    n = name.lower()
    if "convolution" in n or n.startswith("conv"):
        return "convolution"
    if "custom-call" in n or "custom_call" in n or "tpu_custom_call" in n:
        return "custom_call (pallas)"
    if any(k in n for k in ("copy", "transpose", "reshape", "bitcast",
                            "concatenate", "pad", "slice", "gather",
                            "dynamic-update")):
        return "copy/transpose/reshape"
    if "fusion" in n:
        return "fusion"
    if "dot" in n or "einsum" in n:
        return "dot"
    if any(k in n for k in ("all-reduce", "all-gather", "collective",
                            "reduce-scatter")):
        return "collective"
    return "other"


def summarize(trace_dir, top=25):
    pbs = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not pbs:
        raise SystemExit(f"no *.xplane.pb under {trace_dir}")
    table, categories, plane_names = device_op_table(parse_xspace(pbs[-1]))
    if not table:
        raise SystemExit(f"no TPU device plane events; planes seen: "
                         f"{plane_names}")

    def cat(name):
        return categories.get(name) or bucket(name)

    # while/conditional envelopes double-count their body ops (the body's
    # events are separate entries on the same line)
    table = {n: v for n, v in table.items()
             if cat(n) not in ("while", "conditional")}
    rows = sorted(table.items(), key=lambda kv: -kv[1][0])
    total_ps = sum(v[0] for v in table.values())
    buckets = defaultdict(float)
    for name, (ps, _) in table.items():
        buckets[cat(name)] += ps / 1e9
    out = {
        "metric": "xprof_device_op_summary",
        "xplane_pb": pbs[-1],
        "device_total_ms": round(total_ps / 1e9, 3),
        "buckets_ms": {k: round(v, 3)
                       for k, v in sorted(buckets.items(),
                                          key=lambda kv: -kv[1])},
        "top_ops": [
            {"op": name, "total_ms": round(ps / 1e9, 3), "count": cnt,
             "bucket": cat(name)}
            for name, (ps, cnt) in rows[:top]],
    }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace-dir", required=True)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--json", default=None,
                   help="also write the summary to this path")
    args = p.parse_args()
    out = summarize(args.trace_dir, args.top)
    for r in out["top_ops"]:
        print(f"# {r['total_ms']:>10.3f} ms x{r['count']:<5d} "
              f"[{r['bucket']}] {r['op'][:90]}", file=sys.stderr)
    print(f"# buckets: {out['buckets_ms']}", file=sys.stderr)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "top_ops"}))


if __name__ == "__main__":
    main()
