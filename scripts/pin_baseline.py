"""Pin the per-case oracle baselines ONCE (VERDICT r4 weak #7).

Measures the float64 numpy NR oracle (the reference-compute-class proxy;
bench.py:24) for every shipped case under one fixed protocol —
best-of-5 trials x 25 repeats on an otherwise idle host — and writes
BASELINE_ORACLE.json at the repo root.  bench.py, scripts/bench_cases.py
and README all cite THIS file instead of re-measuring per artifact, which
previously produced drifting baselines (1225.8 vs 844.7 solves/s for the
same case33 oracle across sessions).

Run on an idle host: python scripts/pin_baseline.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import platform

from bench import measure_baseline_oracle
from mapdn_tpu.grid import make_case

CASES = ["case33", "case69", "case141", "case322"]
TRIALS = 5
REPEATS = 25


def main():
    rows = {}
    for case in CASES:
        grid, load_p, load_q, _ = make_case(case)
        sps = measure_baseline_oracle(grid, load_p, load_q,
                                      repeats=REPEATS, trials=TRIALS)
        rows[case] = round(sps, 1)
        print(f"{case}: {sps:.1f} solves/s", flush=True)
    out = {
        "metric": "pinned float64 numpy NR oracle solves/s per case "
                  "(reference-compute-class baseline proxy, single env)",
        "protocol": f"best-of-{TRIALS} trials x {REPEATS} repeats, idle host",
        "host": platform.processor() or platform.machine(),
        "cases": rows,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_ORACLE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
