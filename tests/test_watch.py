"""Watch mode: last-wins dedup, deletes, change-driven re-crawl, seq
watermark, checkpointed exactly-once over the changes stream."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from npm_search_spark.frontier import Crawl
from npm_search_spark.schema import CHANGES
from npm_search_spark.sources import synthetic as SYN
from npm_search_spark.streaming.watch import Watch, dedup_last_wins

N_DOCS = 30


@pytest.fixture(scope="module")
def universe(spark):
    return {k: v.cache() for k, v in SYN.universe(spark, N_DOCS, partitions=2).items()}


@pytest.fixture()
def bootstrapped(spark, universe, tmp_path):
    c = Crawl(
        spark, str(tmp_path / "crawl"), universe, 10_000_000,
        budget_multiplier=100, backoff_scale=0.01,
        # tombstone mode: the tests audit per-URL frontier rows (e.g. the
        # once-per-seq enqueue) that gc_terminal=True (default) would GC
        gc_terminal=False,
    )
    c.seed(universe["raw_docs"].select("doc_id"))
    c.run_bootstrap(max_generations=40, log=None)
    return c


def test_dedup_last_wins(spark):
    rows = [
        (1, "a", False, "r1"),
        (2, "a", False, "r2"),
        (3, "b", True, "r3"),
    ]
    got = {
        r["id"]: (r["seq"], r["deleted"])
        for r in dedup_last_wins(spark.createDataFrame(rows, CHANGES)).collect()
    }
    assert got == {"a": (2, False), "b": (3, True)}


def test_registry_info(spark, tmp_path):
    from npm_search_spark.streaming.watch import registry_info

    changes_dir = str(tmp_path / "ch")
    os.makedirs(changes_dir)
    spark.createDataFrame(
        [(1, "a", False, "r1"), (2, "a", False, "r2"), (3, "b", True, "r3")], CHANGES
    ).coalesce(1).write.mode("append").parquet(changes_dir)
    assert registry_info(spark, changes_dir) == {"nb_docs": 2, "seq": 3}


def test_watch_auto_compacts_seen(spark, universe, bootstrapped, tmp_path):
    """Long-running watch maintenance: when incremental appends exceed the
    file budget, the seen set is rewritten as one clustered file set —
    dedup semantics unchanged."""
    c = bootstrapped
    n_seen = c.seen.count(spark)
    assert len(c.seen.table.snapshot().files) > 1
    changes_dir = str(tmp_path / "ch-compact")
    os.makedirs(changes_dir)
    pkg = c.packages.read(spark).select("objectID").orderBy("objectID").first()[0]
    spark.createDataFrame([(901, pkg, False, "rev-c")], CHANGES).coalesce(1).write.mode(
        "append"
    ).parquet(changes_dir)
    w = Watch(c, changes_dir, str(tmp_path / "ckpt-compact"), seen_compact_files=1)
    w.run_available_now()
    hist = c.seen.table.history()
    assert any(s.meta.get("op") == "seen-compact" for s in hist)
    assert c.seen.count(spark) >= n_seen  # rows preserved (+ the new change)
    # post-compaction dedup still exact: the change URL is now seen
    seq_url = f"https://registry.npmjs.org/{pkg}?_seq=901"
    assert (
        c.seen.filter_unseen(
            spark, spark.createDataFrame([(seq_url,)], "url string")
        ).count()
        == 0
    )


def test_watch_applies_changes(spark, universe, bootstrapped, tmp_path):
    c = bootstrapped
    pkgs_before = c.packages.read(spark)
    some = [r["objectID"] for r in pkgs_before.select("objectID").orderBy("objectID").limit(4).collect()]
    deleted_pkg, updated_pkg = some[0], some[1]

    changes_dir = str(tmp_path / "changes")
    os.makedirs(changes_dir)
    batch1 = [
        (101, updated_pkg, False, "rev-x"),
        (102, updated_pkg, False, "rev-y"),   # duplicate id -> last wins
        (103, deleted_pkg, True, "rev-z"),
    ]
    spark.createDataFrame(batch1, CHANGES).coalesce(1).write.mode("append").parquet(changes_dir)

    w = Watch(c, changes_dir, str(tmp_path / "ckpt"))
    w.run_available_now()

    pkgs = c.packages.read(spark)
    assert pkgs.where(F.col("objectID") == deleted_pkg).count() == 0
    assert pkgs.where(F.col("objectID") == updated_pkg).count() == 1
    st = c.state.load()
    assert st.stage == "watch"
    assert st.seq == 103

    # once-per-change: exactly one frontier row for seq 102, none for 101
    fr = c.frontier.read(spark)
    assert fr.where(F.col("url").contains("_seq=102")).count() == 1
    assert fr.where(F.col("url").contains("_seq=101")).count() == 0

    # replay the same files through the same checkpoint: no-op
    n_before = pkgs.count()
    Watch(c, changes_dir, str(tmp_path / "ckpt")).run_available_now()
    assert c.packages.read(spark).count() == n_before
    assert c.state.load().seq == 103

    # a second batch re-touches the deleted package: it comes back
    batch2 = [(104, deleted_pkg, False, "rev-w")]
    spark.createDataFrame(batch2, CHANGES).coalesce(1).write.mode("append").parquet(changes_dir)
    Watch(c, changes_dir, str(tmp_path / "ckpt")).run_available_now()
    assert c.packages.read(spark).where(F.col("objectID") == deleted_pkg).count() == 1
    assert c.state.load().seq == 104


def test_trigger_budget_caps_admission(spark, universe, bootstrapped, tmp_path):
    """Watch-mode politeness (T7 at trigger granularity): with a
    trigger-window budget set, a micro-batch's drain generations draw from
    ONE per-host ledger — a hot host with 30 pending changes and a
    6 req/s budget over a 2 s window admits at most 12 fetches per batch,
    however many generations the batch runs; the rest stay pending for the
    next poll."""
    c = bootstrapped
    pkgs = [r["objectID"] for r in c.packages.read(spark).select("objectID").collect()]
    changes_dir = str(tmp_path / "ch-budget")
    os.makedirs(changes_dir)
    rows = [(200 + i, p, False, f"rev-b{i}") for i, p in enumerate(pkgs)]
    spark.createDataFrame(rows, CHANGES).coalesce(1).write.mode("append").parquet(
        changes_dir
    )

    window = 2.0  # registry budget 6 req/s -> 12 admissions per batch
    cap = int(c.budgets["registry.npmjs.org"] * window)
    assert len(rows) > cap
    w = Watch(
        c, changes_dir, str(tmp_path / "ckpt-budget"),
        generations_per_batch=8, trigger_budget_secs=window,
    )
    w.run_available_now()

    fr = c.frontier.read(spark)
    change_rows = fr.where(F.col("url").contains("_seq=2"))
    processed = change_rows.where(F.col("state") != "pending").count()
    still_pending = change_rows.where(F.col("state") == "pending").count()
    assert 0 < processed <= cap
    assert still_pending >= len(rows) - cap
    # the next poll window drains another ledger's worth
    Watch(
        c, changes_dir, str(tmp_path / "ckpt-budget2"),
        generations_per_batch=8, trigger_budget_secs=window,
    ).run_available_now()
    fr2 = c.frontier.read(spark)
    processed2 = fr2.where(
        F.col("url").contains("_seq=2") & (F.col("state") != "pending")
    ).count()
    assert processed < processed2 <= 2 * cap


def test_empty_poll_runs_no_generations(spark, universe, bootstrapped, tmp_path):
    """ChangesReader pacing (reference src/npm/ChangesReader.ts:77-84): an
    idle feed must not spin crawl generations — an empty micro-batch is a
    no-op (no generation increment, no state advance), and the
    processingTime trigger sleeps until the next poll."""
    c = bootstrapped
    changes_dir = str(tmp_path / "ch-empty")
    os.makedirs(changes_dir)
    w = Watch(c, changes_dir, str(tmp_path / "ckpt-empty"))
    gen_before = w._generation
    st_before = c.state.load()
    empty = spark.createDataFrame([], CHANGES)
    w.process_batch(empty, 0)
    assert w._generation == gen_before
    st_after = c.state.load()
    assert (st_after.seq if st_after else None) == (st_before.seq if st_before else None)


def test_supervised_restart_backs_off_and_recovers(spark, universe, bootstrapped, tmp_path):
    """The supervised runner retries a failed query from the checkpoint
    (exponential backoff) — the reference's error path on the _changes
    long-poll. First attempt dies mid-batch; the retry replays the batch
    exactly-once and lands the change."""
    c = bootstrapped
    pkg = c.packages.read(spark).select("objectID").orderBy("objectID").first()[0]
    changes_dir = str(tmp_path / "ch-err")
    os.makedirs(changes_dir)
    spark.createDataFrame([(701, pkg, False, "rev-e")], CHANGES).coalesce(1).write.mode(
        "append"
    ).parquet(changes_dir)
    w = Watch(c, changes_dir, str(tmp_path / "ckpt-err"))
    real = w.process_batch
    calls = {"n": 0}

    def flaky(batch, batch_id):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("synthetic long-poll failure")
        real(batch, batch_id)

    w.process_batch = flaky
    w.run_available_now(max_restarts=3, max_backoff_secs=0.05)
    assert calls["n"] >= 2
    assert c.state.load().seq == 701


def test_continuous_trigger_idles_without_work(spark, universe, bootstrapped, tmp_path):
    """run_continuous polls on a processingTime trigger; with an empty feed
    it stays active without running any generation."""
    import time as _time

    c = bootstrapped
    changes_dir = str(tmp_path / "ch-idle")
    os.makedirs(changes_dir)
    w = Watch(c, changes_dir, str(tmp_path / "ckpt-idle"))
    gen_before = w._generation
    q = w.run_continuous(poll_interval_secs=1.0, await_termination=False)
    try:
        assert q.isActive
        _time.sleep(3.0)
        assert q.isActive
        assert w._generation == gen_before
    finally:
        q.stop()
