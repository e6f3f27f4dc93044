"""Background re-enrichment jobs: periodic downloads refresh + deleted-pkg
reconciliation (J9) and one-time changelog re-probe with +1-week deferral."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from npm_search_spark.frontier import Crawl
from npm_search_spark.periodic import (
    ONE_TIME_RETRY_MS,
    PERIODIC_WINDOW_MS,
    run_one_time,
    run_periodic,
)
from npm_search_spark.sources import synthetic as SYN

N_DOCS = 30
NOW = 1_755_000_000_000


@pytest.fixture(scope="module")
def universe(spark):
    return {k: v.cache() for k, v in SYN.universe(spark, N_DOCS, partitions=2).items()}


@pytest.fixture()
def crawl(spark, universe, tmp_path):
    c = Crawl(
        spark, str(tmp_path / "c"), universe, 10_000_000,
        budget_multiplier=100, backoff_scale=0.01,
    )
    c.seed(universe["raw_docs"].select("doc_id"))
    c.run_bootstrap(max_generations=40, log=None)
    return c


def test_periodic_refresh_and_reconcile(spark, universe, crawl):
    pkgs = crawl.packages.read(spark)
    n_before = pkgs.count()
    # make a package unknown to the downloads feed and old -> J9 candidate
    ghost = pkgs.orderBy("objectID").limit(1).select("objectID").first()[0]
    crawl.universe = dict(crawl.universe)
    crawl.universe["npm_downloads"] = universe["npm_downloads"].where(
        F.col("name") != ghost
    )
    crawl.universe["raw_docs"] = universe["raw_docs"].where(F.col("doc_id") != ghost)

    later = NOW + PERIODIC_WINDOW_MS + 1
    m = run_periodic(crawl, later)
    assert m["periodic_due"] > 0
    assert m["periodic_deleted"] == 1  # the ghost got reconciled away

    after = crawl.packages.read(spark)
    assert after.count() == n_before - 1
    assert after.where(F.col("objectID") == ghost).count() == 0
    # everyone refreshed: window stamped
    assert after.where(F.col("_periodicDataUpdatedAt") != later).count() == 0
    # downloads fields repopulated from the dim
    sample = after.where(F.col("downloadsLast30Days") > 0).count()
    assert sample > 0

    # immediately re-running finds nothing due
    assert run_periodic(crawl, later)["periodic_due"] == 0


def test_periodic_error_defers_one_day(spark, universe, crawl):
    """T5 periodic-error class (reference PeriodicBackgroundIndexer.ts:
    170-183): an errored package keeps its old values and becomes due again
    tomorrow, not in 30 days."""
    from npm_search_spark.periodic import DAY_MS, PERIODIC_ERROR_RETRY_MS

    later = NOW + PERIODIC_WINDOW_MS + 1
    m = run_periodic(crawl, later, error_modulus=3)
    assert m["periodic_errors"] > 0
    assert m["periodic_refreshed"] + m["periodic_errors"] == m["periodic_due"]
    after = crawl.packages.read(spark)
    # errored packages: stamped to be due again in exactly +1 day
    errored = after.where(
        F.col("_periodicDataUpdatedAt")
        == later - PERIODIC_WINDOW_MS + PERIODIC_ERROR_RETRY_MS
    )
    assert errored.count() == m["periodic_errors"]
    # not due now, due again tomorrow
    assert run_periodic(crawl, later)["periodic_due"] == 0
    m2 = run_periodic(crawl, later + DAY_MS + 1)
    assert m2["periodic_due"] == m["periodic_errors"]


def test_one_time_reprobe_and_deferral(spark, crawl):
    pkgs = crawl.packages.read(spark)
    due = pkgs.where(
        (F.col("_oneTimeDataToUpdateAt") != 0) & F.col("changelogFilename").isNull()
    )
    n_due = due.count()
    if n_due == 0:
        pytest.skip("bootstrap resolved every changelog in this universe")
    m = run_one_time(crawl, NOW + 1)
    assert m["one_time_due"] == n_due
    after = crawl.packages.read(spark)
    # unresolved ones are deferred a week, not due anymore
    still_due = after.where(
        (F.col("_oneTimeDataToUpdateAt") != 0)
        & (F.col("_oneTimeDataToUpdateAt") <= NOW + 1)
    )
    assert still_due.count() == 0
    deferred = after.where(F.col("_oneTimeDataToUpdateAt") == NOW + 1 + ONE_TIME_RETRY_MS)
    assert deferred.count() + m["one_time_resolved"] == n_due
