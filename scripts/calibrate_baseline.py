"""Calibrate bench.py's CPU-reference denominator.

Runs `bench.py::bench_cpu_reference` N times back to back on an otherwise
idle box and prints the median + spread. The resulting median is pinned as
`bench.py::CPU_BASELINE_CALIBRATED` (with the date), because the live
denominator measured inside a driver bench run swung 21.0-54.6
audio-sec/sec across rounds 1-4 (`BENCH_r0{1..4}.json`) purely with
across-session box load, swinging the headline multiplier 754-1961x while
the TPU numerator moved 1.6%.

  python scripts/calibrate_baseline.py [--runs 9]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--runs", type=int, default=9)
    args = p.parse_args(argv)

    import bench

    rates = []
    for i in range(args.runs):
        r = bench.bench_cpu_reference()
        rates.append(r)
        print(f"run {i + 1}/{args.runs}: {r:.2f} audio-sec/sec",
              file=sys.stderr, flush=True)
    rates = np.asarray(rates)
    print(json.dumps({
        "median_audio_sec_per_sec": round(float(np.median(rates)), 1),
        "min": round(float(rates.min()), 1),
        "max": round(float(rates.max()), 1),
        "n_runs": args.runs,
        "pinned_in": "bench.py::CPU_BASELINE_CALIBRATED",
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
