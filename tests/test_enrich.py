"""Enrichment-stage parity with the reference's saveDoc expectations
(src/__tests__/saveDocs.test.ts:195-426): hits/downloads/definitely-typed
joins, popularity, popularAlternativeNames gating, security-held skip."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from npm_search_spark.enrich import enrich_packages, rank_jsdelivr_hits
from npm_search_spark.format_pkg import format_package
from npm_search_spark.schema import PACKAGE

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
NOW_MS = 1_755_000_000_000
NOW_DAY = 1_754_956_800_000
LAST_CRAWL = "2026-08-16T00:00:00.000Z"

EMPTY_SPANS = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"


@pytest.fixture(scope="module")
def preact_doc():
    with open(os.path.join(FIX, "preact.json")) as f:
        return json.load(f)


def _enrich(spark, docs, hits, downloads=None, dt=None, total=10**15, spans=None):
    recs = []
    for d in docs:
        r = format_package(d, NOW_MS, LAST_CRAWL)
        r["doc_id"] = r["objectID"]
        recs.append(r)
    pkg_schema = "doc_id string, " + ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in PACKAGE.fields
    )
    df = spark.createDataFrame(recs, pkg_schema).withColumn(
        "spans", F.lit(None).cast(EMPTY_SPANS)
    )
    if spans:
        span_df = spark.createDataFrame(
            [(k, v) for k, v in spans.items()], f"doc_id string, s {EMPTY_SPANS}"
        )
        df = df.drop("spans").join(span_df, "doc_id", "left").withColumnRenamed("s", "spans")
    df = df.withColumn("spans", F.coalesce(F.col("spans"), F.array().cast(EMPTY_SPANS)))
    hits_df = spark.createDataFrame(hits, "name string, hits long")
    dl_df = spark.createDataFrame(downloads or [], "name string, downloads_last_30d long")
    dt_df = spark.createDataFrame(dt or [], "name string, types_name string")
    out = enrich_packages(df, rank_jsdelivr_hits(hits_df), dt_df, dl_df, total, NOW_DAY)
    return {r["objectID"]: r.asDict(recursive=True) for r in out.collect()}


def test_preact_enrichment_golden(spark, preact_doc):
    got = _enrich(spark, [preact_doc], hits=[("preact", 12345), ("reactjs", 1234)])
    p = got["preact"]
    assert p["jsDelivrHits"] == 12345
    assert p["popular"] is True  # top-1k hit rank
    assert p["_jsDelivrPopularity"] == 2  # len('12345') - 3
    assert p["downloadsLast30Days"] == 0
    assert p["downloadsRatio"] == 0.0
    assert p["humanDownloadsLast30Days"] == "0"
    assert p["types"]["ts"] == "included"
    assert p["moduleTypes"] == ["esm"]
    assert p["styleTypes"] == ["none"]  # empty filelist -> none
    assert p["changelogFilename"] is None
    assert p["_oneTimeDataToUpdateAt"] == NOW_DAY  # needs one-time reindex
    assert p["_searchInternal"]["popularAlternativeNames"] == [
        "preact", "preact.js", "preactjs",
    ]


def test_downloads_join_golden(spark, preact_doc):
    """J2/J5: downloads data lands (reference 'reuse existing downloads')."""
    got = _enrich(
        spark,
        [preact_doc],
        hits=[("preact", 12345)],
        downloads=[("preact", 2233)],
        total=10**10,
    )
    p = got["preact"]
    assert p["downloadsLast30Days"] == 2233
    assert p["humanDownloadsLast30Days"] == "2.2k"
    assert p["popular"] is True  # via hits despite tiny download ratio
    assert p["_downloadsMagnitude"] == 4


def test_not_popular_no_alternative_names(spark, preact_doc):
    doc = {
        **preact_doc,
        "name": "reactjs",
        "dist-tags": {"latest": "1.0.0"},
        "versions": {
            "1.0.0": {**preact_doc["versions"]["8.5.0"], "name": "reactjs", "version": "1.0.0"}
        },
        "time": {**preact_doc["time"], "1.0.0": "2019-08-02T18:34:23.572Z"},
    }
    got = _enrich(spark, [doc], hits=[("preact", 12345), ("reactjs", 1234)])
    r = got["reactjs"]
    assert r["jsDelivrHits"] == 1234
    # rank top-1k would make it popular in a 2-row dim; push it out of top-1k
    # is impossible here, so assert the gating directly on a no-hit pkg below
    got2 = _enrich(spark, [doc], hits=[("preact", 12345)])
    r2 = got2["reactjs"]
    assert r2["popular"] is False
    assert r2["_searchInternal"]["popularAlternativeNames"] == []


def test_security_held_skips_enrichment(spark, preact_doc):
    doc = {
        **preact_doc,
        "name": "trello-enterprises",
        "dist-tags": {"latest": "1000.1000.1000"},
        "versions": {
            "1000.1000.1000": {
                **preact_doc["versions"]["8.5.0"],
                "name": "trello-enterprises",
                "version": "1000.1000.1000",
            }
        },
        "time": {**preact_doc["time"], "1000.1000.1000": "2019-08-02T18:34:23.572Z"},
        "repository": {"type": "git", "url": "https://github.com/npm/security-holder"},
    }
    got = _enrich(
        spark, [doc],
        hits=[("trello-enterprises", 99999)],
        downloads=[("trello-enterprises", 12345678)],
    )
    t = got["trello-enterprises"]
    assert t["isSecurityHeld"] is True
    assert t["jsDelivrHits"] == 0  # enrichment skipped
    assert t["downloadsLast30Days"] == 0
    assert t["popular"] is False
    assert t["_searchInternal"]["popularAlternativeNames"] == []
    assert t["_oneTimeDataToUpdateAt"] is None


def test_dts_span_beats_definitely_typed(spark, preact_doc):
    doc = {
        **preact_doc,
        "name": "plain-pkg",
        "dist-tags": {"latest": "1.0.0"},
        "versions": {
            "1.0.0": {
                k: v
                for k, v in {**preact_doc["versions"]["8.5.0"], "name": "plain-pkg", "version": "1.0.0"}.items()
                if k not in ("types", "typings")
            }
        },
        "time": {**preact_doc["time"], "1.0.0": "2019-08-02T18:34:23.572Z"},
    }
    spans = {
        "plain-pkg": [
            {"kind": "media", "text": "/dist/x.d.ts", "media_ref": "https://cdn.jsdelivr.net/npm/plain-pkg@1.0.0/dist/x.d.ts", "offset": 0}
        ]
    }
    got = _enrich(
        spark, [doc], hits=[], dt=[("plain-pkg", "plain-pkg")], spans=spans
    )
    assert got["plain-pkg"]["types"]["ts"] == "included"
    got2 = _enrich(spark, [doc], hits=[], dt=[("plain-pkg", "plain-pkg")])
    assert got2["plain-pkg"]["types"]["ts"] == "definitely-typed"
    assert got2["plain-pkg"]["types"]["definitelyTyped"] == "@types/plain-pkg"
