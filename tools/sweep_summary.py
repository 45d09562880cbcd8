"""Summarize a sweep jsonl into the defaults-justification table.

Groups rows by (temperature, depth, score_temp), averages across
datasets (the reference's mean-over-6-datasets convention,
README.md:136-144), and prints a markdown table plus the argmax row per
temperature. Usage: python tools/sweep_summary.py SWEEP_r03.jsonl > SWEEP_r03.md
"""

import json
import sys
from collections import defaultdict


def main(path):
    rows = [json.loads(l) for l in open(path) if l.strip()]
    groups = defaultdict(list)
    for r in rows:
        groups[(r["temperature"], r["depth"], r["score_temp"])].append(r)

    print(f"# Sweep summary: {path}")
    print()
    meta = rows[0]
    print(f"Engine {meta['engine']}, quant {meta['quant']}, draft "
          f"{meta['draft']}, chunk_len {meta['chunk_len']}, "
          f"{meta['questions']} questions/dataset, "
          f"{len({r['name'] for r in rows})} datasets, "
          f"{meta['new_tokens'] // meta['questions']} tokens/question.")
    print()
    print("| T | depth | score_temp | mean tok/s | mean accept/round | "
          "mean latency s |")
    print("|---|---|---|---|---|---|")
    best = {}
    for key in sorted(groups):
        rs = groups[key]
        tput = sum(r["throughput_tok_s"] for r in rs) / len(rs)
        acc = sum(r["accept_per_round"] or 0 for r in rs) / len(rs)
        lat = sum(r["avg_latency_s"] for r in rs) / len(rs)
        t, d, s = key
        print(f"| {t:g} | {d} | {s:g} | {tput:.1f} | {acc:.2f} | "
              f"{lat:.3f} |")
        if t not in best or tput > best[t][1]:
            best[t] = (key, tput)
    print()
    for t, (key, tput) in sorted(best.items()):
        print(f"**Best at T={t:g}**: depth {key[1]}, score_temp {key[2]:g} "
              f"-> {tput:.1f} tok/s mean over datasets.")
    print()
    print("Defaults shipped: trained-draft benches use the T=0 argmax "
          "(bench.py BENCH_DEPTH/BENCH_SCORE_TEMP defaults); TreeConfig "
          "itself keeps reference-parity depth 6 / score_temp 1.")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "SWEEP_r03.jsonl")
