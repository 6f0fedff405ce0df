"""Reconcile bench.py's update leg vs bench_update_modes (VERDICT r4
weak #3, still open after round 5's same-session repro: bench_update
302.4 ms where the modes script measured the SAME config at 203.6 ms).

Hypothesis: the number is position-dependent in the process lifetime —
bench.py times the update after the 640-model leg has run (device
memory pressure / allocator state), the modes script in a fresh process.
Measure the update, run the 640 leg, measure the update again with the
SAME compiled executable. One JSON line per measurement.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import bench


def main() -> None:
    t1, m1, d1 = bench.bench_update()
    print(json.dumps({"leg": "update_fresh", "ms": round(d1 * 1e3, 1),
                      "mfu": round(m1, 4)}), flush=True)
    t640, m640, d640 = bench.bench_model(640, streams=16)
    print(json.dumps({"leg": "model640", "ms": round(d640 * 1e3, 2),
                      "mfu": round(m640, 4)}), flush=True)
    t2, m2, d2 = bench.bench_update()
    print(json.dumps({"leg": "update_after_640", "ms": round(d2 * 1e3, 1),
                      "mfu": round(m2, 4)}), flush=True)


if __name__ == "__main__":
    main()
