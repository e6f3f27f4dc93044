#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its DuckDB oracle side-by-side and
compare row count, column names, and an order-insensitive value hash
(columns sorted by name, floats canonicalized via repr of round-trip).

Also the round-5 sf1.0 battery runner (VERDICT r4 "Next round" #4): with
``--sf-dir .data/sf1.0 --json-out CORRECTNESS_SF1.json`` it records a
CORRECTNESS-style JSON report with per-query Spark wall seconds, so
super-linear-scaling queries are visible next to the sf0.1 bench times.

Usage: python scripts/check_correctness.py [--sf-dir DIR] [--cores N]
       [--json-out FILE] [query ...]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(bool(v)).lower()
    return str(v)


def row_hashes(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--shuffle-partitions", type=int, default=None,
                    help="default: min(cores*4, 32)")
    ap.add_argument("--json-out", default=None,
                    help="write a CORRECTNESS-style JSON report (per-query "
                         "status + Spark/oracle wall seconds) to this path")
    ap.add_argument("queries", nargs="*", help="subset of query names to run")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from npm_search_spark.session import get_spark

    sf_dir = args.sf_dir
    shuffle = args.shuffle_partitions or min(args.cores * 4, 32)
    spark = get_spark("correctness", cores=args.cores, shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    only = set(args.queries)
    failures = 0
    report = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {e}")
            failures += 1
            report[name] = {"status": "spark_error", "err": str(e)[:500]}
            continue
        spark_s = round(time.monotonic() - t0, 3)
        sql = oracles.get(name)
        if sql is None:
            print(f"{name}: no_oracle rows={len(rows)} ({spark_s}s)")
            report[name] = {
                "status": "no_oracle", "spark_rows": len(rows),
                "spark_s": spark_s,
            }
            continue
        t1 = time.monotonic()
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {e}")
            failures += 1
            report[name] = {"status": "oracle_error", "err": str(e)[:500],
                            "spark_s": spark_s}
            continue
        oracle_s = round(time.monotonic() - t1, 3)
        ok_cols = sorted(cols) == sorted(ocols)
        ok_rows = len(rows) == len(orows)
        ok_hash = ok_cols and row_hashes(cols, rows) == row_hashes(ocols, orows)
        status = "PASS" if (ok_cols and ok_rows and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name}: {status} rows={len(rows)}/{len(orows)} "
            f"cols={'ok' if ok_cols else f'{sorted(cols)} vs {sorted(ocols)}'} "
            f"hash={'ok' if ok_hash else 'MISMATCH'} ({spark_s}s spark, "
            f"{oracle_s}s oracle)"
        )
        report[name] = {
            "status": status.lower(),
            "rows_match": ok_rows,
            "schema_match": ok_cols,
            "hash_match": bool(ok_hash),
            "spark_rows": len(rows),
            "oracle_rows": len(orows),
            "spark_s": spark_s,
            "oracle_s": oracle_s,
        }
    if args.json_out:
        n_pass = sum(1 for v in report.values() if v["status"] == "pass")
        n_no_oracle = sum(1 for v in report.values() if v["status"] == "no_oracle")
        out = {
            "sf_dir": sf_dir,
            "cores": args.cores,
            "shuffle_partitions": shuffle,
            "n_queries": len(report),
            "n_pass": n_pass,
            "n_no_oracle": n_no_oracle,
            "n_fail_or_error": len(report) - n_pass - n_no_oracle,
            "queries": report,
        }
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {args.json_out}: {n_pass} pass / {n_no_oracle} no_oracle "
              f"/ {len(report) - n_pass - n_no_oracle} fail")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
