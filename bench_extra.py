#!/usr/bin/env python
"""Round-6 optimization harness (bench.py is FROZEN for measurement; this
file holds the extra instrumentation the optimization round needs).

Modes:
  --queries [names...]   time each headline/battery query: df.count() (the
                         driver's timed action) N times + one noop-sink pass,
                         print per-query seconds as JSON
  --explain [names...]   write .explain("formatted") for each query to
                         plans/r06/<query>_<tag>.txt
  --drain                run the frontier drain exactly like bench.py's
                         default mode (same synth input, same passes) and
                         print the per-generation profile

All timings run on the same session config as bench.py (get_spark with
shuffle_partitions=32, UI on for task metrics).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from bench import HEADLINE  # noqa: E402  (frozen list, reused for parity)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", action="store_true")
    ap.add_argument("--all-queries", action="store_true",
                    help="time the full battery, not just HEADLINE")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--noop", action="store_true",
                    help="also time one noop-sink pass per query")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from npm_search_spark.session import get_spark

    spark = get_spark(
        "bench-extra",
        cores=args.cores,
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    names = args.names or (list(queries) if args.all_queries else HEADLINE)

    if args.explain:
        os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
        for name in names:
            df = queries[name](spark, args.sf_dir)
            p = os.path.join(REPO, "plans", "r06", f"{name}_{args.tag}.txt")
            with open(p, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
            print(f"wrote {p}", file=sys.stderr)
        return 0

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        samples = []
        for i in range(args.repeats):
            df = queries[name](spark, args.sf_dir)
            t0 = time.time()
            df.count()
            samples.append(round(time.time() - t0, 3))
        rec = {"count_s": samples, "median_s": round(statistics.median(samples), 3)}
        if args.noop:
            df = queries[name](spark, args.sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            rec["noop_s"] = round(time.time() - t0, 3)
        out[name] = rec
        print(f"{name}: {rec}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": args.sf_dir, "cores": args.cores, "queries": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
