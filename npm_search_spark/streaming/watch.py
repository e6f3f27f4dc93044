"""Watch mode: incremental replication crawl via Structured Streaming.

Re-creates the reference's watch stage (src/watch.ts:57-199):

  ChangesReader long-poll      readStream over the append-only changes
                               table; limit:10/poll -> maxFilesPerTrigger
  last-wins per-batch dedup    groupBy(id).max_by(seq) (watch.ts:119-126)
  queue upsert, newest wins    frontier MERGE by url (J7)
  deletes                      packages MERGE DELETE (S13)
  store-then-advance           foreachBatch commits all tables, then the
                               seq watermark; the streaming checkpoint
                               advances only after the batch returns (T2 —
                               exactly the reference's pause->store->ack)

The per-batch body reuses the bootstrap generation function — state lives
in tables, none in the JVM, matching the reference's "state lives in the
index" philosophy (src/StateManager.ts:45-69).

Change-event identity: a changed package must be re-fetched even though
its registry URL was crawled during bootstrap, while a *replayed* change
(crash/redelivery) must dedup. The frontier row for a change therefore
carries the seq in the URL query (?_seq=N): the URL-seen set then gives
exactly once-per-change semantics. Version-pinned hop-2/hop-3 URLs stay
seq-free — immutable content dedups across changes, which is correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..frontier import Crawl, registry_url
from ..functions.urls import canonicalize_url, url_host
from ..schema import CHANGES, FRONTIER
from ..state import CrawlState


def registry_info(spark, changes_dir: str) -> dict:
    """Registry progress probe (S4): total distinct docs + the current
    update seq of the change feed — the reference's npm.getInfo
    (src/npm/index.ts:103-124), used to report bootstrap/watch progress."""
    from ..schema import CHANGES

    df = spark.read.schema(CHANGES).parquet(changes_dir)
    row = df.agg(
        F.count_distinct("id").alias("nb_docs"), F.max("seq").alias("seq")
    ).first()
    return {"nb_docs": row["nb_docs"], "seq": int(row["seq"] or 0)}


def dedup_last_wins(changes: DataFrame) -> DataFrame:
    """Keep the newest change per package id (A2)."""
    return (
        changes.groupBy("id")
        .agg(F.max_by(F.struct("seq", "deleted", "rev"), "seq").alias("c"))
        .select("id", "c.seq", "c.deleted", "c.rev")
    )


def change_frontier_rows(crawl: Crawl, upserts: DataFrame) -> DataFrame:
    dl = crawl.universe["npm_downloads"]
    url = F.concat(
        registry_url(F.col("id")), F.lit("?_seq="), F.col("seq").cast("string")
    )
    return (
        upserts.join(
            F.broadcast(dl.withColumnRenamed("name", "id")), "id", "left"
        )
        .select(
            canonicalize_url(url).alias("url"),
            F.lit("registry.npmjs.org").alias("host"),
            F.lit("registry_doc").alias("kind"),
            F.col("id").alias("doc_id"),
            F.coalesce(F.col("downloads_last_30d"), F.lit(0)).cast("double").alias("priority"),
            F.lit(0).alias("retries"),
            F.lit("pending").alias("state"),
            F.lit(None).cast("timestamp").alias("next_attempt_at"),
            F.col("seq"),
            F.struct(
                F.spark_partition_id().alias("partition_id"),
                F.lit(0).cast("long").alias("snapshot_id"),
                F.lit(-1).alias("generation"),
            ).alias("lineage"),
        )
    )


class Watch:
    def __init__(
        self,
        crawl: Crawl,
        changes_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int = 1,
        generations_per_batch: int = 6,
        dims_refresh_secs: float = 3600.0,
        seen_compact_files: int = 512,
        trigger_budget_secs: float | None = None,
    ):
        self.crawl = crawl
        self.changes_dir = changes_dir
        self.checkpoint_dir = checkpoint_dir
        self.max_files_per_trigger = max_files_per_trigger
        self.generations_per_batch = generations_per_batch
        # politeness at trigger granularity: when set, a micro-batch's
        # generations draw from ONE per-host ledger of rate x this window
        # (the streaming twin of the bootstrap's per-generation budget) —
        # however many generations the batch runs, per-host admission never
        # exceeds the window budget. None = uncapped (tests/backfill).
        # run_continuous fills it with the poll interval by default.
        self.trigger_budget_secs = trigger_budget_secs
        # maintenance: once incremental seen-set appends accumulate this
        # many data files, rewrite them as one (bucket, key)-clustered set
        # so lookup pruning stays tight over a long watch run
        self.seen_compact_files = seen_compact_files
        # hourly dim-preload refresh in long-running watch mode (reference
        # src/index.ts:66-76)
        self.dims_refresh_secs = dims_refresh_secs
        self._generation = (crawl.state.load() or CrawlState()).generation

    # -- per-batch body (also usable in batch mode/tests) ---------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        import time as _time

        crawl, spark = self.crawl, self.crawl.spark
        if _time.time() - crawl._dims_refreshed_at >= self.dims_refresh_secs:
            crawl.refresh_dims()
        deduped = dedup_last_wins(batch).cache()
        if not deduped.take(1):
            # idle poll: zero generations, no state advance — the
            # processingTime trigger sleeps until the next tick
            deduped.unpersist()
            return

        # deletes: drop from packages + quarantine note (reference
        # MainWatchIndexer.ts:80-81)
        deletes = deduped.where(F.col("deleted"))
        if deletes.take(1):
            # file-granular MERGE DELETE: only data files containing a
            # deleted objectID are rewritten, not the whole packages table
            crawl.packages.merge_delete(
                spark,
                deletes.select(F.col("id").alias("objectID")),
                key="objectID",
                meta={"op": "watch-delete", "batch": batch_id},
            )

        # upserts: enqueue newest-change frontier rows (J7 newest wins via
        # URL-seen once-per-seq identity), then drain with the same
        # generation function bootstrap uses
        upserts = deduped.where(~F.col("deleted"))
        if upserts.take(1):
            rows = change_frontier_rows(crawl, upserts)
            # enqueue-dedup: stats-pruned + broadcast-probed, never a
            # shuffle of the frontier (changes are registry URLs)
            from ..frontier import filter_new_urls

            fresh_rows = filter_new_urls(
                crawl.frontier, spark, rows, ["registry.npmjs.org"]
            )
            crawl.frontier.append(
                fresh_rows.select(*[f.name for f in FRONTIER.fields]),
                meta={"op": "watch-enqueue", "batch": batch_id},
            )
            # per-trigger-window politeness ledger: every generation draws
            # its absolute per-host budget from the remaining window budget,
            # so admission per host per batch <= rate x trigger — the
            # token-bucket invariant at trigger granularity (the
            # sub-trigger pacing operator is streaming/ratelimit.py)
            ledger: dict[str, int] | None = None
            if self.trigger_budget_secs is not None:
                ledger = {
                    h: int(rate * self.trigger_budget_secs)
                    for h, rate in crawl.budgets.items()
                }
            for _ in range(self.generations_per_batch):
                self._generation += 1
                m = crawl.run_generation(self._generation, budgets_override=ledger)
                if ledger is not None:
                    for h, n in m.get("scheduled_by_host", {}).items():
                        ledger[h] = ledger.get(h, 0) - n
                if m["scheduled"] == 0:
                    break

        snap = crawl.seen.table.snapshot()
        if snap and len(snap.files) > self.seen_compact_files:
            crawl.seen.compact(spark)
            # compaction supersedes every pre-compaction file; expire the
            # dead history in the same maintenance beat so seen-set bytes
            # track the live set (keep_last covers the one-generation
            # resume window the state log can roll back to)
            crawl.seen.table.expire_snapshots(keep_last=4)

        # store-then-advance: the seq watermark commits only after every
        # table write above has landed (T1/T2)
        max_seq = deduped.agg(F.max("seq")).first()[0]
        crawl.state.save(
            CrawlState(
                generation=self._generation,
                seq=int(max_seq),
                stage="watch",
                bootstrap_done=True,
                snapshots=crawl._snapshots(),
                metrics={"batch_id": batch_id},
                host_pauses=dict(crawl.host_pauses),
            )
        )
        deduped.unpersist()

    # -- streaming wrapper -----------------------------------------------------

    def _start(self, **trigger_kwargs):
        spark = self.crawl.spark
        stream = (
            spark.readStream.schema(CHANGES)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(self.changes_dir)
        )
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(**trigger_kwargs)
            .start()
        )

    def _supervised(self, make_query, max_restarts, max_backoff_secs):
        """Run a streaming query, restarting from the checkpoint with
        exponential backoff on error — the reference ChangesReader's error
        path on the _changes long-poll (src/npm/ChangesReader.ts:77-84).
        Safe to restart blindly: process_batch is store-then-advance and
        the source checkpoint only acks a batch after it returns, so a
        crashed batch replays exactly-once."""
        import time as _time

        restarts = 0
        while True:
            q = make_query()
            try:
                q.awaitTermination()
                return q
            except Exception:
                if max_restarts is not None and restarts >= max_restarts:
                    raise
                _time.sleep(min(2.0 ** restarts, max_backoff_secs))
                restarts += 1

    def run_available_now(self, max_restarts: int | None = 0, max_backoff_secs: float = 60.0):
        """Consume everything currently in the changes table, then stop
        (the test/cron trigger; production uses run_continuous).
        ``max_restarts`` > 0 adds the supervised error-backoff restart."""
        return self._supervised(
            lambda: self._start(availableNow=True), max_restarts, max_backoff_secs
        )

    def run_continuous(
        self,
        poll_interval_secs: float = 30.0,
        max_restarts: int | None = None,
        max_backoff_secs: float = 300.0,
        await_termination: bool = True,
    ):
        """Long-running watch: poll the changes feed every
        ``poll_interval_secs`` — the reference ChangesReader's 30 s idle
        pace (src/npm/ChangesReader.ts:77-84). An empty poll runs ZERO
        generations (process_batch early-returns on an empty batch) and the
        processingTime trigger sleeps until the next tick, so an idle feed
        costs nothing. Errors restart from the streaming checkpoint with
        exponential backoff (``max_restarts=None`` retries forever, the
        production default). ``await_termination=False`` returns the
        running query for the caller to manage. Unless the caller already
        pinned ``trigger_budget_secs``, the per-batch politeness ledger is
        sized to this poll interval — production watch admission is
        rate x poll window per host, however many drain generations a
        batch runs."""
        if self.trigger_budget_secs is None:
            self.trigger_budget_secs = poll_interval_secs
        make = lambda: self._start(  # noqa: E731
            processingTime=f"{poll_interval_secs} seconds"
        )
        if not await_termination:
            return make()
        return self._supervised(make, max_restarts, max_backoff_secs)
