"""
Benchmark analysis: summarize `benchmarks.py` output per kernel/group
(the analog of the reference's Timings.py jupytext notebook,
reference: Timings.py:69-155).

Usage:
    python benchmarks.py > bench_results.jsonl
    python timings_report.py bench_results.jsonl
"""

import json
import sys
from collections import defaultdict


def main(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                rows.append(json.loads(line))

    groups = defaultdict(dict)
    kernels = []
    for r in rows:
        key = (r["group"], r.get("param"))
        groups[key][r["kernel"]] = r["ms_per_op"]
        if r["kernel"] not in kernels:
            kernels.append(r["kernel"])

    header = f"{'group':<18} {'param':>8} " + " ".join(f"{k:>10}" for k in kernels)
    print(header)
    print("-" * len(header))
    for (group, param), vals in sorted(groups.items(), key=lambda kv: (kv[0][0], str(kv[0][1]))):
        cells = " ".join(
            f"{vals.get(k, float('nan')):>10.3f}" for k in kernels
        )
        print(f"{group:<18} {str(param):>8} {cells}")

    # per-kernel geometric-mean speedup vs the first kernel (oracle)
    if len(kernels) > 1:
        import math

        base = kernels[0]
        print()
        for k in kernels[1:]:
            logs = [
                math.log(vals[base] / vals[k])
                for vals in groups.values()
                if base in vals and k in vals and vals[k] > 0
            ]
            if logs:
                print(f"geomean speedup {k} vs {base}: "
                      f"{math.exp(sum(logs) / len(logs)):.2f}x")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "bench_results.jsonl")
