"""Summarize a jax.profiler perfetto trace: exclusive per-op device time.

Usage: python tools/trace_summary.py '/path/to/*.trace.json.gz' [--top 40]

Handles nested lanes (while bodies, fusions inside loops) by computing
EXCLUSIVE time per event on each (pid, tid) track with an interval stack, so
parent while-loops don't double-count their children.
"""

import argparse
import collections
import glob
import gzip
import json
import re


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--lane", default="TPU", help="substring of process name")
    ap.add_argument("--keep-ids", action="store_true",
                    help="do not merge op names differing by trailing .N ids")
    args = ap.parse_args()

    path = sorted(glob.glob(args.trace))[-1]
    data = json.load(gzip.open(path) if path.endswith(".gz") else open(path))
    events = data.get("traceEvents", [])

    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")

    tracks = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X":
            continue
        if args.lane.lower() not in pids.get(e.get("pid"), "").lower():
            continue
        tracks[(e["pid"], e.get("tid", 0))].append(
            (e["ts"], e["ts"] + e.get("dur", 0), e.get("name", "")))

    def canon(name):
        if args.keep_ids:
            return name
        return re.sub(r"(\.\d+)+$", "", name)

    excl = collections.Counter()
    cnt = collections.Counter()
    for track, evs in tracks.items():
        evs.sort(key=lambda x: (x[0], -(x[1] - x[0])))
        stack = []  # (end_ts, canonical_name)
        for ts, te, raw in evs:
            while stack and stack[-1][0] <= ts:
                stack.pop()
            name = canon(raw)
            dur = te - ts
            excl[name] += dur
            cnt[name] += 1
            if stack:  # subtract from the immediate parent only
                excl[stack[-1][1]] -= dur
            stack.append((te, name))

    total = sum(v for v in excl.values() if v > 0)
    print(f"trace: {path}")
    print(f"sum of exclusive op time: {total / 1e3:.1f} ms")
    for name, us in excl.most_common(args.top):
        print(f"{us / 1e3:9.2f} ms  x{cnt[name]:6d}  {name[:100]}")


if __name__ == "__main__":
    main()
