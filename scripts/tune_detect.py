"""A/B the detection pipeline's tail/canvas/batch knobs on real hardware.

Runs bench.py (VGA) under a matrix of env configurations in subprocesses
(env is read at Detector construction) and prints a ranked table.  Used to
pick the shipped defaults; results land in PERF.md.

Usage: python scripts/tune_detect.py [quick|full]
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUICK = [
    # (label, env)
    ("v1 gather tail B=8", {"JDA_TPU_TAIL": "gather"}),
    ("mxu canvas=gather B=8", {"JDA_TPU_CANVAS": "gather"}),
    ("mxu canvas=rows B=8", {"JDA_TPU_CANVAS": "rows"}),
]

FULL = QUICK + [
    ("v1 gather tail B=16", {"JDA_TPU_TAIL": "gather", "BENCH_BATCH": "16", "BENCH_CHUNKS": "4"}),
    ("mxu canvas=rows B=16", {"JDA_TPU_CANVAS": "rows", "BENCH_BATCH": "16", "BENCH_CHUNKS": "4"}),
    ("v1 gather tail B=32", {"JDA_TPU_TAIL": "gather", "BENCH_BATCH": "32", "BENCH_CHUNKS": "2"}),
]


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    rows = []
    for label, env in QUICK if mode == "quick" else FULL:
        e = dict(os.environ)
        e.update(env)
        e.setdefault("BENCH_REPS", "2")
        p = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            env=e,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"{label:28s}  FAILED rc={p.returncode}")
            tail = (p.stderr or p.stdout).splitlines()[-8:]
            print("   " + "\n   ".join(tail))
            continue
        d = json.loads(line[-1])
        rows.append((label, d))
        print(
            f"{label:28s}  {d['value']:7.2f} img/s  vs_ref {d.get('vs_baseline')}"
            f"  runs {d.get('runs_images_per_sec')}"
        )
    if rows:
        best = max(rows, key=lambda r: r[1]["value"])
        print(f"\nbest: {best[0]} at {best[1]['value']} img/s")


if __name__ == "__main__":
    main()
