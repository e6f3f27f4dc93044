"""Windowed event rollup: the batch expression (oracle-checked as
``windowed_event_rollup``) must produce identical results when driven as a
Structured Streaming query — readStream + withWatermark + tumbling window,
availableNow trigger — proving the op is genuinely streaming-shaped."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _rollup(df):
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 3).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@pytest.mark.usefixtures("spark")
class TestStreamingWindowEquivalence:
    def test_stream_matches_batch(self, spark, sf_dir, tmp_path):
        import time

        events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        # feed time-ordered slices as separate files (the file source picks
        # files up in modification-time order, like a real stream arriving
        # roughly in event-time order — the regime watermarks are for)
        src = str(tmp_path / "stream-src")
        lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
        span = (hi - lo) / 6
        for i in range(6):
            s, e = lo + i * span, lo + (i + 1) * span
            cond = (F.col("ts") >= s) & (
                (F.col("ts") < e) if i < 5 else (F.col("ts") <= hi)
            )
            events.where(cond).coalesce(1).write.mode("append").parquet(src)
            time.sleep(1.05)  # distinct mtimes -> deterministic pickup order

        batch = {tuple(r) for r in _rollup(spark.read.parquet(src)).collect()}

        stream_in = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
            # the parquet column is TIMESTAMP_NTZ; event-time watermarks
            # require TIMESTAMP (session tz is pinned UTC, so the cast is
            # a type change, not a wall-time shift)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "2 hours")
        )
        out_dir = str(tmp_path / "sink")
        chk = str(tmp_path / "chk")
        q = (
            _rollup(stream_in)
            .writeStream.outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", chk)
            .format("parquet")
            .start(out_dir)
        )
        q.awaitTermination(300)
        got = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
        # append mode emits only watermark-closed windows; every emitted
        # window must match batch exactly (same counts/sums — no partial or
        # dropped rows), and all but the final unclosed windows must emit
        assert got <= batch
        assert len(got) >= 0.9 * len(batch)
        # one emission per (window, type)
        assert len(got) == len({t[:2] for t in got})
