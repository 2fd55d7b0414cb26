"""
Benchmark analysis: summarize `benchmarks.py` output per kernel/group
(the analog of the reference's Timings.py jupytext notebook,
reference: Timings.py:69-155).

Usage:
    python benchmarks.py > bench_results.jsonl
    python timings_report.py bench_results.jsonl

Saved-run comparison (the reference's pytest-benchmark autosave +
Timings.py history analysis, reference: pytest.ini:7, Timings.py:69-155):
    python benchmarks.py --save          # appends to bench_history/
    python timings_report.py --compare   # latest run vs previous
    python timings_report.py --compare OLD.json NEW.json
"""

import json
import os
import sys
from collections import defaultdict

HISTORY_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_history")


def _load_history(path):
    with open(path) as f:
        run = json.load(f)
    table = {}
    for r in run["results"]:
        # rate-style rows (e.g. MultAB-ESC-rate gterms_s, weak-scaling
        # Gnnz/s) have no ms_per_op; the ms comparison skips them
        if "ms_per_op" in r:
            table[(r["group"], str(r.get("param")), r["kernel"])] = r["ms_per_op"]
    return run, table


def compare(old_path=None, new_path=None, threshold=0.15):
    """Compare two saved runs; flag changes beyond ``threshold``.

    Returns the number of regressions (for CI exit codes)."""
    if old_path is None or new_path is None:
        def _is_timing_run(path):
            # other artifacts share the directory (e.g. weak-scaling
            # records with their own schema); compare only full
            # benchmark runs
            try:
                with open(path) as f:
                    return "backend" in json.load(f)
            except (OSError, ValueError):
                return False

        files = sorted(
            p for f in os.listdir(HISTORY_DIR)
            if f.endswith(".json")
            and _is_timing_run(p := os.path.join(HISTORY_DIR, f))
        )
        if len(files) < 2:
            print(f"need two runs in {HISTORY_DIR} (have {len(files)}); "
                  "run `python benchmarks.py --save` first")
            return 0
        old_path, new_path = files[-2], files[-1]
    old_run, old = _load_history(old_path)
    new_run, new = _load_history(new_path)
    print(f"old: {os.path.basename(old_path)} ({old_run['git_rev']}, "
          f"{old_run['backend']})")
    print(f"new: {os.path.basename(new_path)} ({new_run['git_rev']}, "
          f"{new_run['backend']})")
    if old_run["backend"] != new_run["backend"]:
        print("WARNING: backends differ; timings are not comparable")

    header = f"{'group':<18} {'param':>8} {'kernel':>8} " \
             f"{'old ms':>10} {'new ms':>10} {'delta':>8}"
    print(header)
    print("-" * len(header))
    regressions = 0
    for key in sorted(set(old) & set(new)):
        o, n = old[key], new[key]
        delta = (n - o) / o if o else float("inf")
        flag = ""
        if delta > threshold:
            flag = "  <-- REGRESSION"
            regressions += 1
        elif delta < -threshold:
            flag = "  (improved)"
        group, param, kernel = key
        print(f"{group:<18} {param:>8} {kernel:>8} {o:>10.3f} {n:>10.3f} "
              f"{delta:>+7.1%}{flag}")
    missing = set(old) - set(new)
    if missing:
        print(f"{len(missing)} benchmarks present in old but not new")
    return regressions


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
    if len(sys.argv) > 1 and sys.argv[1] == "--compare":
        n_reg = compare(*sys.argv[2:4])
        sys.exit(1 if n_reg else 0)
    main(sys.argv[1] if len(sys.argv) > 1 else "bench_results.jsonl")
