#!/usr/bin/env python
"""Gate-scale kill/resume equivalence check (VERDICT r4 "Next round" #5).

test_frontier proves resume-exactness at unit scale; this script proves it
at a much larger config with a REAL mid-generation SIGKILL:

1. Reference run: full bootstrap of an N-package synthetic universe at
   root A (uninterrupted).
2. Killed run: the same bootstrap at root B in a child process; the parent
   watches the child's progress file and SIGKILLs the process group the
   moment generation K starts — mid-generation, partial writes in flight.
3. Resume: relaunch root B; `Crawl.resume()` must roll back to the last
   checkpoint and re-run to completion.
4. Equivalence: packages / frontier / seen / not_found / one_time digests
   of A and B must match (volatile per-run columns excluded: revision
   counters, crawl timestamps, retry-maturity timestamps, and moved_by
   generation stamps — wall-clock backoff can legally shift WHICH
   generation re-processes a matured retry).

Usage: python scripts/check_resume_gate.py [--n-docs 5000]
       [--budget-multiplier 200] [--kill-generation 3] [--cores 32]
Exit 0 = equivalent; 1 = divergence (details printed).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VOLATILE = {
    "packages": {"lastCrawl", "_revision"},
    "frontier": {"next_attempt_at", "lineage"},
    "not_found": {"moved_by", "next_attempt_at", "lineage"},
    "one_time": set(),
}


def make_crawl(spark, root: str, n_docs: int, mult: int):
    from npm_search_spark.frontier import Crawl
    from npm_search_spark.sources import synthetic as SYN

    uni = {k: v.cache() for k, v in SYN.universe(spark, n_docs, partitions=8).items()}
    return Crawl(
        spark,
        root,
        uni,
        total_npm_downloads=10_000_000,
        budget_multiplier=mult,
        backoff_scale=0.02,
        transient_modulus=13,  # exercise retry/backoff across the kill point
        checkpoint_interval=3,  # kills can land mid-interval (deferred seen adds)
    )


def run_child(args) -> int:
    from npm_search_spark.session import get_spark

    spark = get_spark("resume-gate-run", cores=args.cores, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    c = make_crawl(spark, args.root, args.n_docs, args.budget_multiplier)
    if c.frontier.current_snapshot_id() is None:
        c.seed(c.universe["raw_docs"].select("doc_id"))

    def log(m):  # run_bootstrap hands log() an already-JSON-encoded string
        with open(args.progress_file, "a") as f:
            f.write(m + "\n")
            f.flush()

    c.run_bootstrap(max_generations=200, log=log)
    log(json.dumps({"done": True}))
    return 0


def spawn(args, root: str, progress: str):
    return subprocess.Popen(
        [
            sys.executable, os.path.abspath(__file__), "--phase", "run",
            "--root", root, "--progress-file", progress,
            "--n-docs", str(args.n_docs),
            "--budget-multiplier", str(args.budget_multiplier),
            "--cores", str(args.cores),
        ],
        cwd=REPO,
        start_new_session=True,  # kill the whole process group (JVM included)
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )


def wait_done(proc, progress: str, timeout_s: int = 3600) -> None:
    t0 = time.time()
    while proc.poll() is None:
        if time.time() - t0 > timeout_s:
            os.killpg(proc.pid, signal.SIGKILL)
            raise RuntimeError("child timed out")
        time.sleep(2)
    if proc.returncode != 0:
        raise RuntimeError(f"child failed rc={proc.returncode}")
    with open(progress) as f:
        assert any('"done": true' in ln for ln in f), "child never finished"


def kill_at_generation(proc, progress: str, gen: int, timeout_s: int = 3600) -> None:
    t0 = time.time()
    while True:
        if proc.poll() is not None:
            raise RuntimeError(
                f"child exited (rc={proc.returncode}) before generation {gen}"
            )
        if time.time() - t0 > timeout_s:
            os.killpg(proc.pid, signal.SIGKILL)
            raise RuntimeError("child timed out before kill point")
        try:
            with open(progress) as f:
                lines = [json.loads(ln) for ln in f if ln.strip()]
        except FileNotFoundError:
            lines = []
        # generation G's metrics line appears when G COMPLETES; seeing
        # generation (gen-1) complete means generation `gen` is in flight
        if any(m.get("generation") == gen - 1 for m in lines):
            time.sleep(1.5)  # let generation `gen` get some writes in flight
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait()
            return
        time.sleep(0.5)


def digests(spark, root: str, n_docs: int, mult: int) -> dict:
    from pyspark.sql import functions as F

    c = make_crawl(spark, root, n_docs, mult)

    def dig(df, volatile):
        cols = sorted(set(df.columns) - volatile)
        return sorted(
            r["h"]
            for r in df.select(
                F.md5(F.to_json(F.struct(*cols))).alias("h")
            ).collect()
        )

    out = {
        "packages": dig(c.packages.read(spark), VOLATILE["packages"]),
        "frontier": dig(c.frontier.read(spark), VOLATILE["frontier"]),
        "not_found": dig(c.not_found.read(spark), VOLATILE["not_found"])
        if c.not_found.exists()
        else [],
        "one_time": dig(c.one_time.read(spark), VOLATILE["one_time"])
        if c.one_time.exists()
        else [],
        "seen_keys": sorted(
            r["key"] for r in c.seen.table.read(spark).select("key").collect()
        )
        if c.seen.table.current_snapshot_id() is not None
        else [],
    }
    out["counts"] = {k: len(v) for k, v in out.items()}
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["parent", "run"], default="parent")
    ap.add_argument("--root", default=None)
    ap.add_argument("--progress-file", default=None)
    ap.add_argument("--n-docs", type=int, default=5000)
    ap.add_argument("--budget-multiplier", type=int, default=200)
    ap.add_argument("--kill-generation", type=int, default=3)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    if args.phase == "run":
        return run_child(args)

    import shutil
    import tempfile

    wd = args.workdir or tempfile.mkdtemp(prefix="resume-gate-")
    os.makedirs(wd, exist_ok=True)
    root_a, root_b = os.path.join(wd, "ref"), os.path.join(wd, "killed")
    prog_a, prog_b1, prog_b2 = (os.path.join(wd, f"p{i}.jsonl") for i in range(3))
    t0 = time.time()
    try:
        print(f"[1/4] reference run at {root_a}", file=sys.stderr)
        wait_done(spawn(args, root_a, prog_a), prog_a)
        print(f"[2/4] killed run at {root_b} (SIGKILL in generation "
              f"{args.kill_generation})", file=sys.stderr)
        kill_at_generation(
            spawn(args, root_b, prog_b1), prog_b1, args.kill_generation
        )
        print("[3/4] resume run", file=sys.stderr)
        wait_done(spawn(args, root_b, prog_b2), prog_b2)
        print("[4/4] comparing digests", file=sys.stderr)
        from npm_search_spark.session import get_spark

        spark = get_spark("resume-gate-cmp", cores=args.cores, shuffle_partitions=32)
        spark.sparkContext.setLogLevel("ERROR")
        da = digests(spark, root_a, args.n_docs, args.budget_multiplier)
        db = digests(spark, root_b, args.n_docs, args.budget_multiplier)
        diffs = {
            k: {
                "only_ref": len(set(da[k]) - set(db[k])),
                "only_resumed": len(set(db[k]) - set(da[k])),
            }
            for k in ("packages", "frontier", "not_found", "one_time", "seen_keys")
            if da[k] != db[k]
        }
        result = {
            "equivalent": not diffs,
            "n_docs": args.n_docs,
            "budget_multiplier": args.budget_multiplier,
            "kill_generation": args.kill_generation,
            "counts_ref": da["counts"],
            "counts_resumed": db["counts"],
            "diffs": diffs,
            "elapsed_s": round(time.time() - t0, 1),
        }
        print(json.dumps(result))
        return 0 if result["equivalent"] else 1
    finally:
        if args.workdir is None:
            shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
