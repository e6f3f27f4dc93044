"""Streaming token-bucket admission (streaming/ratelimit.py): exactness
vs an independent Python simulator, and streaming-vs-batch equivalence
with state carried across micro-batches."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from npm_search_spark.streaming.ratelimit import (
    batch_token_bucket,
    streaming_token_bucket,
)

BUDGETS = {"registry.npmjs.org": 6, "raw.githubusercontent.com": 20}
T0 = datetime.datetime(2026, 1, 1, 0, 0, 0)


def _requests(spark, n=4000):
    """Deterministic skewed request log: 3 hosts, one hot, ~10 req/s
    arrival per host lane (over budget for registry, under for github)."""
    hosts = ["registry.npmjs.org", "raw.githubusercontent.com", "cdn.jsdelivr.net"]
    rows = []
    for i in range(n):
        h = hosts[i % 3] if i % 10 else hosts[0]  # extra heat on registry
        ms = (i * 97) % 120_000  # 2 minutes of event time, shuffled order
        rows.append(
            (h, f"https://{h}/r/{i}", T0 + datetime.timedelta(milliseconds=ms), float(i % 50))
        )
    return spark.createDataFrame(
        rows, "host string, url string, ts timestamp, priority double"
    )


def _simulate(rows, budgets, default_budget=6, burst_s=1.0):
    """Straight-line reference: per host, time-ordered token bucket."""
    out = {}
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    for h, rs in by_host.items():
        rate = float(budgets.get(h, default_budget))
        tokens, last_ms, cap = rate * burst_s, None, rate * burst_s
        for r in sorted(rs, key=lambda r: (r["ts"], r["url"])):
            ms = int(r["ts"].timestamp() * 1000)
            if last_ms is not None and ms > last_ms:
                tokens = min(cap, tokens + (ms - last_ms) / 1000.0 * rate)
            last_ms = ms if last_ms is None else max(last_ms, ms)
            if tokens >= 1.0:
                tokens -= 1.0
                out[r["url"]] = True
            else:
                out[r["url"]] = False
    return out


class TestBatchTokenBucket:
    def test_matches_simulator(self, spark):
        reqs = _requests(spark)
        got = {
            r["url"]: r["admitted"]
            for r in batch_token_bucket(reqs, BUDGETS).collect()
        }
        expected = _simulate(reqs.collect(), BUDGETS)
        assert got == expected

    def test_budget_enforced_per_second(self, spark):
        reqs = _requests(spark)
        adm = batch_token_bucket(reqs, BUDGETS).where("admitted")
        per_sec = (
            adm.groupBy("host", F.date_trunc("second", "ts").alias("s"))
            .count()
            .collect()
        )
        for r in per_sec:
            rate = BUDGETS.get(r["host"], 6)
            # burst of 1s => at most 2x rate in any wall second
            assert r["count"] <= 2 * rate, (r["host"], r["s"], r["count"])

    def test_under_budget_host_all_admitted(self, spark):
        """A host whose arrival rate is below its budget never defers."""
        rows = [
            (
                "raw.githubusercontent.com",
                f"https://raw.githubusercontent.com/r/{i}",
                T0 + datetime.timedelta(milliseconds=i * 100),  # 10/s < 20/s
                0.0,
            )
            for i in range(500)
        ]
        reqs = spark.createDataFrame(
            rows, "host string, url string, ts timestamp, priority double"
        )
        out = batch_token_bucket(reqs, BUDGETS)
        assert out.where("NOT admitted").count() == 0


class TestStreamingTokenBucket:
    def test_stream_equals_batch_with_carried_state(self, spark, tmp_path):
        """Time-ordered micro-batches with per-host state carried across
        them must reproduce the single-pass batch decision exactly."""
        import time

        reqs = _requests(spark, n=3000)
        src = str(tmp_path / "req-src")
        lo, hi = reqs.agg(F.min("ts"), F.max("ts")).first()
        span = (hi - lo) / 5
        for i in range(5):
            s, e = lo + i * span, lo + (i + 1) * span
            cond = (F.col("ts") >= s) & (
                (F.col("ts") < e) if i < 4 else (F.col("ts") <= hi)
            )
            reqs.where(cond).coalesce(1).write.mode("append").parquet(src)
            time.sleep(1.05)

        expected = {
            r["url"]: r["admitted"]
            for r in batch_token_bucket(
                spark.read.parquet(src), BUDGETS
            ).collect()
        }

        stream_in = (
            spark.readStream.schema(reqs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        out_dir, chk = str(tmp_path / "sink"), str(tmp_path / "chk")
        q = (
            streaming_token_bucket(stream_in, BUDGETS)
            .writeStream.outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", chk)
            .format("parquet")
            .start(out_dir)
        )
        q.awaitTermination(300)
        got = {
            r["url"]: r["admitted"] for r in spark.read.parquet(out_dir).collect()
        }
        assert got == expected
