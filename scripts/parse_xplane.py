"""Parse a jax.profiler xplane trace: per-module op breakdown.

Reads the .xplane.pb files under <trace_dir>/plugins/profile/*/, finds the
TPU device plane, buckets XLA op events by enclosing XLA module (jitted
program) and by op category, and prints per-module totals, top ops, and the
busy-vs-wall gap (idle inside the module = scheduling stalls, not op cost).

Usage: python scripts/parse_xplane.py <trace_dir> [out.json]
"""
import collections
import glob
import json
import os
import sys


def load_xspaces(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    spaces = []
    for p in glob.glob(os.path.join(
            trace_dir, "plugins", "profile", "*", "*.xplane.pb")):
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append((p, xs))
    return spaces


def category_of(name):
    n = name.lower()
    for tag in ("fusion", "dot", "convolution", "custom-call", "copy",
                "dynamic-update-slice", "dynamic-slice", "scatter", "gather",
                "all-reduce", "all-gather", "reduce-scatter", "while",
                "conditional", "rng", "iota", "reduce", "transpose",
                "broadcast", "select", "convert", "slice", "concatenate",
                "bitcast", "tuple", "parameter", "constant", "infeed",
                "outfeed"):
        if n.startswith(tag):
            return tag
    return "other"


def main():
    trace_dir = sys.argv[1]
    spaces = load_xspaces(trace_dir)
    if not spaces:
        print("no xplane files under", trace_dir)
        return

    report = {}
    for path, xs in spaces:
        for plane in xs.planes:
            pname = plane.name
            if "TPU" not in pname and "/device:" not in pname:
                continue
            stat_md = {k: v.name for k, v in plane.stat_metadata.items()}
            ev_md = {k: v for k, v in plane.event_metadata.items()}

            # module windows: line whose events are XLA modules
            modules = []   # (name, t0_ps, t1_ps)
            op_lines = []
            for line in plane.lines:
                lname = line.name.lower()
                if "module" in lname:
                    for ev in line.events:
                        md = ev_md[ev.metadata_id]
                        t0 = line.timestamp_ns * 1000 + ev.offset_ps
                        modules.append(
                            (md.display_name or md.name,
                             t0, t0 + ev.duration_ps))
                elif "op" in lname or "xla" in lname:
                    op_lines.append(line)
            if not op_lines:
                op_lines = list(plane.lines)

            per_mod = collections.defaultdict(lambda: {
                "cat": collections.Counter(),
                "ops": collections.Counter(),
                "busy_ps": 0, "wall_ps": 0, "n_events": 0})
            for name, t0, t1 in modules:
                per_mod[name]["wall_ps"] += t1 - t0

            def find_module(t):
                for name, t0, t1 in modules:
                    if t0 <= t < t1:
                        return name
                return "<outside>"

            for line in op_lines:
                base = line.timestamp_ns * 1000
                for ev in line.events:
                    md = ev_md[ev.metadata_id]
                    nm = md.display_name or md.name
                    t0 = base + ev.offset_ps
                    mod = find_module(t0)
                    d = per_mod[mod]
                    d["cat"][category_of(md.name)] += ev.duration_ps
                    d["ops"][nm] += ev.duration_ps
                    d["busy_ps"] += ev.duration_ps
                    d["n_events"] += 1

            print(f"\n=== plane {pname} ({os.path.basename(path)})")
            rep_plane = {}
            for mod, d in sorted(per_mod.items(),
                                 key=lambda kv: -kv[1]["busy_ps"]):
                wall = d["wall_ps"] / 1e9
                busy = d["busy_ps"] / 1e9
                print(f"\n-- module {mod}: wall {wall:.2f} ms, "
                      f"op-busy {busy:.2f} ms, events {d['n_events']}")
                cats = {k: round(v / 1e9, 3)
                        for k, v in d["cat"].most_common()}
                print("   categories(ms):", cats)
                top = {k: round(v / 1e9, 3)
                       for k, v in d["ops"].most_common(25)}
                for k, v in top.items():
                    print(f"   {v:9.3f} ms  {k[:110]}")
                rep_plane[mod] = {"wall_ms": round(wall, 3),
                                  "busy_ms": round(busy, 3),
                                  "events": d["n_events"],
                                  "categories_ms": cats, "top_ops_ms": top}
            report[pname] = rep_plane

    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
