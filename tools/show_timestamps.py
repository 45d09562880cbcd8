"""Render a saved profiler record as a text timeline.

Ref: records/show_timestamps.ipynb visualizes the reference profiler's
cumulative timestamp stream (profiler/profiler.py:33-43) to find pipeline
bubbles. Same purpose here, as a CLI over `Profiler.save()` JSON: one line
per event with its absolute offset, the delta to the previous event, and a
proportional bar so bubbles (large deltas between turn events) stand out in
a terminal instead of a notebook.

Usage:
    python tools/show_timestamps.py record.json [--top 20]
"""

import argparse
import json


def render(stream, top=0, width=50):
    """stream: [(event, t_seconds), ...] -> list of printable lines."""
    if not stream:
        return ["(empty stream)"]
    lines = []
    deltas = []
    prev = stream[0][1]
    for name, t in stream:
        deltas.append(t - prev)
        prev = t
    dmax = max(deltas) or 1e-9
    for (name, t), d in zip(stream, deltas):
        bar = "#" * max(0, round(width * d / dmax))
        lines.append(f"{t * 1e3:10.3f}ms  +{d * 1e3:8.3f}ms  {name:28s} {bar}")
    if top:
        ranked = sorted(zip(deltas, (n for n, _ in stream)), reverse=True)
        lines.append("")
        lines.append(f"top {top} gaps:")
        for d, name in ranked[:top]:
            lines.append(f"  +{d * 1e3:8.3f}ms before {name}")
    return lines


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("record", help="JSON written by Profiler.save()")
    ap.add_argument("--top", type=int, default=10,
                    help="also list the N largest inter-event gaps")
    args = ap.parse_args(argv)
    with open(args.record) as f:
        rec = json.load(f)
    for line in render([tuple(e) for e in rec.get("stream", [])],
                       top=args.top):
        print(line)
    if rec.get("summary"):
        print("\nspan summary:")
        for name, row in rec["summary"].items():
            print(f"  {name:28s} {row['mean_ms']:9.3f}ms x{row['count']}")


if __name__ == "__main__":
    main()
