#!/usr/bin/env python
"""N→4N scaling for the SHUFFLE-HEAVY operators (sessionize, asof_join).

The suite-build scaling runs (BENCH.md §1-2) are scan-bound; this bench
covers the other regime the north rule cares about: operators whose cost
is a hash shuffle + per-key sort.  Identical deterministic input at both
levels (Spark-range synthetic — rows are pure f(id)), local[8] vs
local[32] spark-submit JVMs (N→4N cores), best of --trials, shuffle
partitions sized to cores.  Prints a summary JSON and appends nothing —
paste into BENCH.md.

Run on a QUIET box; check `uptime` first (BENCH.md measurement notes).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cores: int, n_events: int, n_left: int, trials: int) -> dict:
    env = dict(os.environ, SKIP_ZIP="1")
    best = None
    for t in range(trials):
        out = subprocess.run(
            [
                "spark-submit",
                "--master",
                f"local[{cores}]",
                "--conf",
                f"spark.sql.shuffle.partitions={cores * 4}",
                "--conf",
                "spark.driver.memory=16g",
                "--py-files",
                "dist/bloomfilter_spark.zip",
                "scripts/shuffle_scaling_job.py",
                str(cores),
                str(n_events),
                str(n_left),
            ],
            capture_output=True,
            text=True,
            cwd=REPO,
            check=True,
            env=env,
        )
        rec = json.loads(
            [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        )
        print(f"  local[{cores}] trial {t + 1}: {rec}", file=sys.stderr)
        if best is None:
            best = dict(rec)
        else:
            # best PER OP: trials are independent samples of each job
            for k in ("sessionize_wall_s", "asof_wall_s"):
                best[k] = min(best[k], rec[k])
            for k in ("sessionize_events_per_s", "asof_rows_per_s"):
                best[k] = max(best[k], rec[k])
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=50_000_000)
    ap.add_argument("--left", type=int, default=20_000_000)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--levels", type=int, nargs=2, default=[8, 32],
                    help="N and 4N core counts (2 8 is the cleaner proxy "
                         "on a DRAM-shared box, per BENCH.md §1-2)")
    args = ap.parse_args()

    # the --py-files zip must exist (run_spark_submit.sh §zip builds it)
    if not os.path.exists(os.path.join(REPO, "dist/bloomfilter_spark.zip")):
        raise SystemExit("build dist/bloomfilter_spark.zip first "
                         "(scripts/run_spark_submit.sh does)")

    lo = run_level(args.levels[0], args.events, args.left, args.trials)
    hi = run_level(args.levels[1], args.events, args.left, args.trials)
    result = {
        "events": args.events,
        "asof_left": args.left,
        f"local{args.levels[0]}": lo,
        f"local{args.levels[1]}": hi,
        "sessionize_efficiency": round(
            (hi["sessionize_events_per_s"] / lo["sessionize_events_per_s"])
            / (args.levels[1] / args.levels[0]),
            3,
        ),
        "asof_efficiency": round(
            (hi["asof_rows_per_s"] / lo["asof_rows_per_s"])
            / (args.levels[1] / args.levels[0]),
            3,
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
