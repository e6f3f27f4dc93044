"""Spark-stage fidelity: the Arrow-batched mapInPandas formatPkg stage must
produce exactly what the pure function produces, under the strict PACKAGE
schema, with drops filtered."""

from __future__ import annotations

import json
import os

import pytest

from npm_search_spark.format_pkg import format_package

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
NOW_MS = 1_755_000_000_000
LAST_CRAWL = "2026-08-16T00:00:00.000Z"


@pytest.fixture(scope="module")
def raw_docs():
    with open(os.path.join(FIX, "raw_packages.json")) as f:
        docs = json.load(f)
    with open(os.path.join(FIX, "preact.json")) as f:
        docs.append(json.load(f))
    return docs


def test_map_in_pandas_matches_pure_function(spark, raw_docs):
    from npm_search_spark.format_pkg import format_packages_df

    rows = [(d["_id"], json.dumps(d)) for d in raw_docs]
    # one malformed + one droppable row must be filtered, not crash
    rows.append(("bad", "{not json"))
    rows.append(("unnamed", json.dumps({"_id": "unnamed", "versions": {}})))
    raw_df = spark.createDataFrame(rows, "doc_id string, raw_json string")

    out = format_packages_df(raw_df, NOW_MS, LAST_CRAWL)
    got = {r["doc_id"]: r.asDict(recursive=True) for r in out.collect()}

    assert set(got) == {d["_id"] for d in raw_docs}
    for d in raw_docs:
        want = format_package(d, NOW_MS, LAST_CRAWL)
        g = got[d["_id"]]
        for k, v in want.items():
            gv = g[k]
            if isinstance(v, dict) and not isinstance(gv, dict):
                gv = dict(gv) if gv is not None else None
            assert gv == v or json.dumps(gv, sort_keys=True) == json.dumps(
                v, sort_keys=True
            ), f"{d['_id']}.{k}: {v!r} != {gv!r}"


def test_plan_is_narrow_map(spark, raw_docs):
    """The formatPkg stage must not introduce a shuffle."""
    from npm_search_spark.format_pkg import format_packages_df

    rows = [(d["_id"], json.dumps(d)) for d in raw_docs]
    raw_df = spark.createDataFrame(rows, "doc_id string, raw_json string")
    plan = format_packages_df(raw_df, NOW_MS, LAST_CRAWL)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
