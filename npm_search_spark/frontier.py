"""URL frontier + fetch scheduler: the engine's core.

Re-creates the reference's crawl machinery — Algolia queue indices walked
facet-by-facet by promise pools (src/npm/Prefetcher.ts, src/indexers/*) —
as a generation loop of pure DataFrame stages over SnapTables:

  schedule   P8 predicate (state='pending' AND next_attempt_at<=now) +
             T7 politeness budget per host + W4 priority order
  dedup      URL-seen anti-join (J8) via seen.SeenSet
  fetch      synthetic (join against the generated universe) — the real
             deployment swaps in an iterator mapInPandas HTTP stage
  process    per-kind: registry_doc -> formatPkg+enrich+MERGE + file_list
             hop; file_list -> span metadata patch + changelog-probe hop;
             changelog_probe -> deterministic first-hit-wins (L4)
  commit     frontier/packages/seen/one_time updates + state row with
             snapshot ids, metrics, per-partition lineage

Scale design (10^10 frontier):
- Politeness top-k is a distributed exact top-k (range-partitioned sort +
  driver-side prefix offsets + budget-pruned ranking) — the frontier has
  only ~5 hosts, so a naive per-host window would funnel 10^10 rows
  through ~5 tasks; the range shuffle spreads each hot host across the
  whole cluster (the explicit skew handling the north rule demands).
- The frontier table is only ever touched via pending-state filters
  (partition-pruned parquet scans) and MERGE rewrites of matched rows.
- All joins against the packages table go through doc_id equi-joins;
  scheduled batches are micro-batch-sized, so they broadcast.

Crawl-order determinism: within a generation the scheduled set is exactly
the top-budget_h rows per host under the total order
(priority DESC, url ASC) — a deterministic replacement for the reference's
promise-pool nondeterminism, verified against a straight-line simulator in
tests (SURVEY.md §4(c)).
"""

from __future__ import annotations

import json
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .enrich import enrich_packages, rank_jsdelivr_hits
from .format_pkg import format_packages_df
from .functions import spans as SP
from .functions.urls import canonicalize_url, url_host
from .schema import FINAL_PACKAGE, FRONTIER
from .seen import SeenSet
from .sources.synthetic import FILE_OPTIONS
from .state import CrawlState, StateStore
from .tables import SnapTable

# per-host request budgets, req/s (reference src/npm/index.ts:52-53,
# src/changelog.ts:29,39,50; jsDelivr uncapped in the reference -> registry-like)
DEFAULT_BUDGETS = {
    "registry.npmjs.org": 6,
    "api.npmjs.org": 6,
    "cdn.jsdelivr.net": 6,
    "raw.githubusercontent.com": 20,
    "gitlab.com": 10,
    "bitbucket.org": 10,
}
MAX_RETRIES = 4          # reference src/config.ts:179 (retryMax)
BACKOFF_CAP_S = 60       # reference src/config.ts:181-182


def backoff_seconds(retries_col):
    """(retries+1)^3 seconds capped at 60 (reference src/utils/wait.ts:5-14)."""
    return F.least(F.pow(retries_col + 1, 3), F.lit(BACKOFF_CAP_S)).cast("long")


def politeness_schedule(
    pending: DataFrame,
    budgets: dict[str, int] | None = None,
    default_budget: int = 6,
    budget_multiplier: int = 1,
    n_partitions: int | None = None,
) -> DataFrame:
    """Exact top-budget rows per host under (priority DESC, url ASC) — the
    T7 politeness-bucket operator.

    Scale design: a naive Window.partitionBy(host) funnels each hot host's
    entire pending set (10^9+ rows for 3 structurally hot hosts) through a
    single partition — the frontier's skew problem. Distributed exact
    top-k instead:

      1. repartitionByRange on (host, priority DESC, url) — a parallel
         global sort; each host occupies a contiguous partition run;
      2. per-(partition, host) counts collected to the driver (tiny);
         cumulative offsets identify the prefix partitions that can still
         contain top-budget rows — everything past the budget is pruned
         before any ranking;
      3. exact row_number within the surviving prefix + offset = global
         rank; filter to <= budget.

    The only full-data operation is the range shuffle (linear, scales with
    executors); ranking touches O(budget) rows no matter how large pending
    is. Output is the exact top-budget per host under (priority DESC,
    url ASC), independent of input partitioning — deterministic replay
    (ties broken by url)."""
    budgets = budgets or DEFAULT_BUDGETS
    spark = pending.sparkSession

    def host_budget(host: str) -> int:
        return budgets.get(host, default_budget) * budget_multiplier

    budget_map = F.create_map(*[F.lit(x) for kv in budgets.items() for x in kv])
    budget = (
        F.coalesce(budget_map[F.col("host")], F.lit(default_budget))
        * budget_multiplier
    )

    n_part = n_partitions or spark.sparkContext.defaultParallelism * 2
    # 1. parallel global sort: range-partition by the schedule order. Each
    #    host's rows land in a contiguous run of partitions. Checkpoint pins
    #    partition ids for the offset computation below.
    ranged = (
        pending.repartitionByRange(
            n_part, F.col("host"), F.desc("priority"), F.asc("url")
        )
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # 2. tiny driver-side pass: per-(partition, host) counts -> cumulative
    #    offsets; partitions whose offset already exceeds the host budget
    #    are pruned entirely (the window below only ever sees O(budget)
    #    rows, however big pending is).
    counts = ranged.groupBy("_pid", "host").count().collect()
    counts.sort(key=lambda r: (r["host"], r["_pid"]))
    offsets: list[tuple[int, str, int]] = []
    acc: dict[str, int] = {}
    for r in counts:
        off = acc.get(r["host"], 0)
        if off < host_budget(r["host"]):
            offsets.append((r["_pid"], r["host"], off))
        acc[r["host"]] = off + r["count"]
    if not offsets:
        return pending.limit(0)
    off_df = spark.createDataFrame(offsets, "_pid int, host string, _off long")
    # 3. exact rank on the surviving prefix partitions only
    w = Window.partitionBy("_pid", "host").orderBy(F.desc("priority"), F.asc("url"))
    return (
        ranged.join(F.broadcast(off_df), ["_pid", "host"])
        .withColumn("_grank", F.row_number().over(w) + F.col("_off"))
        .where(F.col("_grank") <= budget)
        .drop("_pid", "_off", "_grank")
    )


def apply_robots(df: DataFrame, robots: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split scheduled URLs into (allowed, blocked) by per-host robots.txt
    disallow prefixes (north rule: politeness + robots). The rules table is
    per-host and tiny -> broadcast join; prefix match is a JVM-side
    higher-order exists over the disallow array."""
    path = F.regexp_replace(F.col("url"), r"^[a-z+]+://[^/]+", "")
    joined = df.join(
        F.broadcast(robots.select("host", "disallow")), "host", "left"
    )
    blocked_cond = F.col("disallow").isNotNull() & F.exists(
        "disallow", lambda p: path.startswith(p)
    )
    allowed = joined.where(~blocked_cond | F.col("disallow").isNull()).drop("disallow")
    blocked = joined.where(blocked_cond).drop("disallow")
    return allowed, blocked


def registry_url(name_col) -> "F.Column":
    return F.concat(F.lit("https://registry.npmjs.org/"), name_col)


def filelist_url(name_col, version_col) -> "F.Column":
    return F.concat(
        F.lit("https://cdn.jsdelivr.net/npm/"), name_col, F.lit("@"), version_col,
        F.lit("/flat"),
    )


def changelog_candidates(pkgs: DataFrame) -> DataFrame:
    """Explode the 18 candidate changelog URLs per package with a known git
    host (reference src/changelog.ts:162-186 + baseUrlMap builders).
    Returns (doc_id, url, host, rank)."""
    r = F.col("repository")
    base = (
        F.when(
            r["host"] == "github.com",
            F.concat(
                F.lit("https://raw.githubusercontent.com/"), r["user"], F.lit("/"),
                r["project"], F.lit("/"),
                F.when(r["path"] != "", F.regexp_replace(r["path"], "/tree/", ""))
                .otherwise(r["branch"]),
            ),
        )
        .when(
            r["host"] == "gitlab.com",
            F.concat(
                F.lit("https://gitlab.com/"), r["user"], F.lit("/"), r["project"],
                F.when(r["path"] != "", F.regexp_replace(r["path"], "tree", "raw"))
                .otherwise(F.concat(F.lit("/raw/"), r["branch"])),
            ),
        )
        .when(
            r["host"] == "bitbucket.org",
            F.concat(
                F.lit("https://bitbucket.org/"), r["user"], F.lit("/"), r["project"],
                F.when(r["path"] != "", F.regexp_replace(r["path"], "src", "raw"))
                .otherwise(F.concat(F.lit("/raw/"), r["branch"])),
            ),
        )
        .otherwise(F.lit(None))
    )
    cands = F.array(*[F.lit(x) for x in FILE_OPTIONS])
    out = (
        pkgs.where(r.isNotNull() & r["host"].isin("github.com", "gitlab.com", "bitbucket.org"))
        .select(
            F.col("objectID").alias("doc_id"),
            F.col("version"),
            F.regexp_replace(base, "/+$", "").alias("_base"),
            F.posexplode(cands).alias("rank", "_file"),
        )
        .select(
            "doc_id",
            "version",
            F.concat(F.col("_base"), F.lit("/"), F.col("_file")).alias("url"),
            (F.col("rank") + 1).alias("rank"),
        )
        .withColumn("host", url_host(F.col("url")))
    )
    return out


def candidate_rank(url_col) -> "F.Column":
    """Recover a candidate URL's fileOptions rank from its basename —
    deterministic replacement for the first-200-wins race (L4)."""
    fname = F.element_at(F.split(url_col, "/"), -1)
    return F.array_position(F.array(*[F.lit(x) for x in FILE_OPTIONS]), fname)


class Crawl:
    """Bootstrap crawl over a synthetic universe, checkpointed per generation."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        universe: dict[str, DataFrame],
        total_npm_downloads: int | None = None,
        budgets: dict[str, int] | None = None,
        budget_multiplier: int = 1,
        now_day_ms: int = 1_755_000_000_000,
        backoff_scale: float = 1.0,
        transient_modulus: int = 37,
    ):
        self.spark = spark
        self.root = root
        self.frontier = SnapTable(f"{root}/frontier", FRONTIER)
        self.packages = SnapTable(f"{root}/packages", FINAL_PACKAGE)
        self.one_time = SnapTable(
            f"{root}/one_time_data",
            None,
        )
        self.not_found = SnapTable(f"{root}/not_found", FRONTIER)
        self.seen = SeenSet(f"{root}/seen")
        self.state = StateStore(f"{root}/state")
        self.universe = universe
        self.budgets = budgets or DEFAULT_BUDGETS
        self.budget_multiplier = budget_multiplier
        self.now_day_ms = now_day_ms
        self.total_downloads = total_npm_downloads or 0
        self.backoff_scale = backoff_scale
        self.transient_modulus = transient_modulus
        self._hits_ranked = rank_jsdelivr_hits(universe["jsdelivr_hits"]).cache()

    # -- seeding -------------------------------------------------------------

    def seed(self, names: DataFrame) -> None:
        """names: (doc_id) -> frontier registry_doc rows with download-count
        -weighted priority (W4)."""
        dl = self.universe["npm_downloads"]
        rows = (
            names.join(F.broadcast(dl.withColumnRenamed("name", "doc_id")), "doc_id", "left")
            .select(
                canonicalize_url(registry_url(F.col("doc_id"))).alias("url"),
                F.lit("registry.npmjs.org").alias("host"),
                F.lit("registry_doc").alias("kind"),
                F.col("doc_id"),
                F.coalesce(F.col("downloads_last_30d"), F.lit(0)).cast("double").alias("priority"),
                F.lit(0).alias("retries"),
                F.lit("pending").alias("state"),
                F.lit(None).cast("timestamp").alias("next_attempt_at"),
                F.lit(0).cast("long").alias("seq"),
                F.struct(
                    F.spark_partition_id().alias("partition_id"),
                    F.lit(0).cast("long").alias("snapshot_id"),
                    F.lit(0).alias("generation"),
                ).alias("lineage"),
            )
        )
        self.frontier.overwrite(rows, meta={"op": "seed"})
        self.state.save(CrawlState(generation=0, snapshots=self._snapshots()))

    def _snapshots(self) -> dict[str, int]:
        return {
            "frontier": self.frontier.current_snapshot_id() or 0,
            "packages": self.packages.current_snapshot_id() or 0,
            "one_time": self.one_time.current_snapshot_id() or 0,
            "not_found": self.not_found.current_snapshot_id() or 0,
            "seen": self.seen.table.current_snapshot_id() or 0,
        }

    # -- resume ----------------------------------------------------------------

    def resume(self) -> CrawlState:
        """Roll all tables back to the last committed state (discarding any
        half-applied generation), return that state."""
        st = self.state.load()
        if st is None:
            return CrawlState()
        snaps = st.snapshots
        self.frontier.rollback(snaps.get("frontier") or None)
        self.packages.rollback(snaps.get("packages") or None)
        self.one_time.rollback(snaps.get("one_time") or None)
        self.not_found.rollback(snaps.get("not_found") or None)
        self.seen.table.rollback(snaps.get("seen") or None)
        self.seen._bloom = None  # force rebuild against the rolled-back set
        return st

    # -- one generation ----------------------------------------------------------

    def run_generation(self, generation: int) -> dict[str, Any]:
        spark = self.spark
        metrics: dict[str, Any] = {"generation": generation}
        t0 = time.time()

        fr = self.frontier.read(spark)
        pending = fr.where(
            (F.col("state") == "pending")
            & (F.col("next_attempt_at").isNull() | (F.col("next_attempt_at") <= F.current_timestamp()))
        )
        scheduled = politeness_schedule(
            pending, self.budgets, budget_multiplier=self.budget_multiplier
        ).cache()
        n_scheduled = scheduled.count()
        metrics["scheduled"] = n_scheduled
        if n_scheduled == 0:
            return metrics

        # robots.txt: disallowed URLs are terminal, never fetched
        robots = self.universe.get("robots")
        if robots is not None:
            eligible, robots_blocked = apply_robots(scheduled, robots)
            eligible = eligible.cache()
            robots_blocked = robots_blocked.cache()
            metrics["robots_blocked"] = robots_blocked.count()
        else:
            eligible, robots_blocked = scheduled, None
            metrics["robots_blocked"] = 0

        # URL-seen dedup (J8): drop anything already crawled
        fresh = self.seen.filter_unseen(spark, eligible).cache()
        metrics["deduped"] = n_scheduled - metrics["robots_blocked"] - fresh.count()

        reg = fresh.where(F.col("kind") == "registry_doc")
        fl = fresh.where(F.col("kind") == "file_list")
        probe = fresh.where(F.col("kind") == "changelog_probe")

        new_rows, done_urls, retry_urls, notfound_urls = [], [fresh.select("url")], [], []

        # ---- registry_doc hop ------------------------------------------------
        reg_fetched = reg.join(self.universe["raw_docs"], "doc_id", "left").cache()
        # synthetic transient error: first attempt on ~1/modulus of URLs
        # fails, the retry succeeds — exercises backoff + requeue (T5);
        # modulus <= 1 disables failures entirely
        if self.transient_modulus > 1:
            transient = (
                F.pmod(F.xxhash64("url"), F.lit(self.transient_modulus)) == 0
            ) & (F.col("retries") == 0)
        else:
            transient = F.lit(False)
        not_found = F.col("raw_json").isNull() | (F.pmod(F.xxhash64("doc_id"), F.lit(41)) == 0)

        failed = reg_fetched.where(transient)
        retry_urls.append(failed.select("url"))
        nf = reg_fetched.where(~transient & not_found)
        notfound_urls.append(nf.select("url"))
        ok = reg_fetched.where(~transient & ~not_found).cache()

        n_ok = ok.count()
        metrics["registry_ok"] = n_ok
        if n_ok:
            formatted = format_packages_df(
                ok, self.now_day_ms, "2026-08-16T00:00:00.000Z"
            ).withColumn("spans", F.array().cast(
                "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
            ))
            enriched = enrich_packages(
                formatted,
                self._hits_ranked,
                self.universe["definitely_typed"],
                self.universe["npm_downloads"],
                self.total_downloads,
                self.now_day_ms,
            )
            self.packages.merge_upsert(
                spark,
                enriched.select(*[f.name for f in FINAL_PACKAGE.fields]),
                key="objectID",
                guard="src._revision >= tgt._revision",
                meta={"generation": generation},
            )
            # hop 2: file list URLs
            hop2 = self.packages.read(spark).join(
                F.broadcast(ok.select("doc_id")), F.col("objectID") == F.col("doc_id"), "left_semi"
            ).select(
                canonicalize_url(filelist_url(F.col("objectID"), F.col("version"))).alias("url"),
                F.lit("cdn.jsdelivr.net").alias("host"),
                F.lit("file_list").alias("kind"),
                F.col("objectID").alias("doc_id"),
                F.col("downloadsLast30Days").cast("double").alias("priority"),
            )
            new_rows.append(hop2)

        # ---- file_list hop ----------------------------------------------------
        n_fl = fl.count()
        metrics["filelist_ok"] = n_fl
        if n_fl:
            spans_df = fl.select("doc_id").join(self.universe["documents"], "doc_id", "left")
            spans_df = spans_df.withColumn(
                "spans",
                F.coalesce(F.col("spans"), F.array().cast(
                    "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
                )),
            )
            pkgs = self.packages.read(spark)
            patched = (
                pkgs.join(F.broadcast(spans_df), pkgs.objectID == spans_df.doc_id, "inner")
                .drop("doc_id")
                .withColumn("changelogFilename", SP.changelog_filename(F.col("spans")))
                .withColumn("types", SP.ts_support(
                    F.col("spans"), F.col("types.ts"),
                    F.when(F.col("types.ts") == "definitely-typed",
                           F.regexp_replace(F.col("types.definitelyTyped"), "^@types/", ""))
                    .otherwise(F.lit(None))))
                .withColumn("moduleTypes", SP.module_types_from_files(F.col("spans"), F.col("moduleTypes")))
                .withColumn("styleTypes", SP.style_types_from_files(F.col("spans"), F.col("styleTypes")))
                .withColumn(
                    "_oneTimeDataToUpdateAt",
                    F.when(F.col("changelogFilename").isNull(), F.lit(self.now_day_ms)).otherwise(F.lit(0)),
                )
                .drop("spans")
            )
            self.packages.merge_upsert(
                spark, patched, key="objectID", meta={"generation": generation}
            )
            # hop 3: changelog probes for packages still missing a changelog,
            # memoized against one_time_data (J4)
            need = patched.where(F.col("changelogFilename").isNull())
            if self.one_time.exists():
                memo = self.one_time.read(spark).select(
                    F.col("objectID").alias("_memo_id")
                )
                need = need.join(
                    F.broadcast(memo),
                    F.concat_ws("@", need.objectID, need.version) == F.col("_memo_id"),
                    "left_anti",
                )
            cands = changelog_candidates(need).select(
                canonicalize_url(F.col("url")).alias("url"),
                "host",
                F.lit("changelog_probe").alias("kind"),
                "doc_id",
                # probe priority: candidate order, best first (rank 1 -> highest)
                (F.lit(1000.0) - F.col("rank")).alias("priority"),
            )
            new_rows.append(cands)

        # ---- changelog_probe hop -------------------------------------------------
        n_probe = probe.count()
        metrics["probes"] = n_probe
        if n_probe:
            winners_universe = self.universe["repo_changelogs"]
            hits = probe.withColumn("_file", F.element_at(F.split("url", "/"), -1)).join(
                F.broadcast(winners_universe),
                (F.col("doc_id") == winners_universe.name)
                & (F.col("_file") == winners_universe.filename),
                "left_semi",
            )
            winners = (
                hits.withColumn("_rank", candidate_rank(F.col("url")))
                .groupBy("doc_id")
                .agg(F.min_by("url", "_rank").alias("changelog_url"))
            )
            pkgs = self.packages.read(spark)
            patched = (
                pkgs.join(F.broadcast(winners), pkgs.objectID == winners.doc_id, "inner")
                .drop("doc_id")
                .withColumn("changelogFilename", F.col("changelog_url"))
                .withColumn("_oneTimeDataToUpdateAt", F.lit(0))
                .drop("changelog_url")
            )
            self.packages.merge_upsert(
                spark, patched, key="objectID", meta={"generation": generation}
            )
            memo_rows = (
                self.packages.read(spark)
                .join(F.broadcast(probe.select("doc_id").distinct()),
                      F.col("objectID") == F.col("doc_id"), "left_semi")
                .select(
                    F.concat_ws("@", "objectID", "version").alias("objectID"),
                    F.col("changelogFilename"),
                )
            )
            self.one_time.append(memo_rows, meta={"generation": generation})

        # ---- frontier bookkeeping --------------------------------------------------
        self.seen.add(spark, fresh.select("url"))

        from functools import reduce

        def union_all(dfs):
            return reduce(lambda a, b: a.unionByName(b), dfs)

        done = union_all(done_urls).withColumn("_new_state", F.lit("done"))
        updates = [done]
        if retry_urls:
            updates.append(union_all(retry_urls).withColumn("_new_state", F.lit("retry")))
        if notfound_urls:
            updates.append(union_all(notfound_urls).withColumn("_new_state", F.lit("not_found")))
        # later entries win (retry/not_found override the blanket 'done')
        upd = union_all(updates).groupBy("url").agg(
            F.max_by("_new_state", F.when(F.col("_new_state") == "done", 0).otherwise(1)).alias("_new_state")
        )
        # dedup-dropped scheduled rows are terminal duplicates
        dup = eligible.join(fresh.select("url"), "url", "left_anti").select("url").withColumn(
            "_new_state", F.lit("dup")
        )
        upd = upd.unionByName(dup)
        if robots_blocked is not None:
            upd = upd.unionByName(
                robots_blocked.select("url").withColumn("_new_state", F.lit("robots_blocked"))
            )

        fr_new = (
            fr.join(F.broadcast(upd), "url", "left")
            .withColumn(
                "retries",
                F.when(F.col("_new_state") == "retry", F.col("retries") + 1).otherwise(F.col("retries")),
            )
            .withColumn(
                "next_attempt_at",
                F.when(
                    F.col("_new_state") == "retry",
                    F.current_timestamp()
                    + F.make_dt_interval(
                        F.lit(0), F.lit(0), F.lit(0),
                        backoff_seconds(F.col("retries") - 1) * self.backoff_scale,
                    ),
                ).otherwise(F.col("next_attempt_at")),
            )
            .withColumn(
                "state",
                F.when(F.col("_new_state").isNull(), F.col("state"))
                .when(F.col("_new_state") == "retry",
                      F.when(F.col("retries") > MAX_RETRIES, F.lit("lost")).otherwise(F.lit("pending")))
                .when(F.col("_new_state") == "dup", F.lit("done"))
                .otherwise(F.col("_new_state")),
            )
            .drop("_new_state")
        )
        if new_rows:
            additions = (
                union_all(new_rows)
                .withColumn("retries", F.lit(0))
                .withColumn("state", F.lit("pending"))
                .withColumn("next_attempt_at", F.lit(None).cast("timestamp"))
                .withColumn("seq", F.lit(0).cast("long"))
                .withColumn(
                    "lineage",
                    F.struct(
                        F.spark_partition_id().alias("partition_id"),
                        F.lit(self.frontier.current_snapshot_id() or 0).cast("long").alias("snapshot_id"),
                        F.lit(generation).alias("generation"),
                    ),
                )
                # a URL already present in the frontier must not be re-queued
                .join(fr.select("url"), "url", "left_anti")
                .dropDuplicates(["url"])
            )
            fr_new = fr_new.unionByName(additions.select(*[f.name for f in FRONTIER.fields]))
        self.frontier.overwrite(fr_new, meta={"generation": generation})
        if notfound_urls:
            nf_rows = fr.join(union_all(notfound_urls), "url", "left_semi")
            self.not_found.append(nf_rows, meta={"generation": generation})

        metrics["elapsed_s"] = round(time.time() - t0, 3)
        metrics["throughput_urls_per_s"] = round(n_scheduled / max(metrics["elapsed_s"], 1e-9), 1)
        scheduled.unpersist()
        fresh.unpersist()
        return metrics

    # -- full bootstrap ------------------------------------------------------------

    def run_bootstrap(self, max_generations: int = 100, log=print) -> list[dict[str, Any]]:
        st = self.resume()
        all_metrics = []
        gen = st.generation
        for _ in range(max_generations):
            gen += 1
            m = self.run_generation(gen)
            all_metrics.append(m)
            if log:
                log(json.dumps(m))
            self.state.save(
                CrawlState(
                    generation=gen,
                    stage="bootstrap",
                    bootstrap_done=m["scheduled"] == 0,
                    snapshots=self._snapshots(),
                    metrics=m,
                )
            )
            if m["scheduled"] == 0:
                # drained, or everything pending is backing off — wait it out
                fr = self.frontier.read(self.spark)
                nxt = fr.where(F.col("state") == "pending").agg(
                    F.min("next_attempt_at")
                ).first()[0]
                if nxt is None:
                    break
                import datetime

                wait = (nxt - datetime.datetime.now(nxt.tzinfo)).total_seconds()
                if wait > 0:
                    time.sleep(min(wait + 0.1, BACKOFF_CAP_S * self.backoff_scale + 1))
        return all_metrics
