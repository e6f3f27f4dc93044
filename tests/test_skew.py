"""Explicit skew handling (functions/skew.py): salted two-phase
aggregation and hot-key split joins — correctness vs the naive plan, and
plan-shape assertions that the skew mechanics are actually in the
physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from npm_search_spark.functions.skew import (
    salted_collect_set,
    salted_count_distinct,
    skew_split_join,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def skewed(spark):
    """1 hot key (80 % of rows) + a tail — the scope-skew shape."""
    return (
        spark.range(10_000)
        .select(
            F.when(F.col("id") % 5 != 0, F.lit("@types"))
            .otherwise(F.concat(F.lit("scope-"), (F.col("id") % 97)))
            .alias("scope"),
            F.concat(F.lit("pkg-"), (F.col("id") % 701)).alias("name"),
            (F.col("id") % 1000).alias("weight"),
        )
        .cache()
    )


class TestSaltedCollectSet:
    def test_matches_naive(self, spark, skewed):
        naive = {
            r["scope"]: sorted(r["vals"])
            for r in skewed.groupBy("scope")
            .agg(F.collect_set("name").alias("vals"))
            .collect()
        }
        salted = {
            r["scope"]: list(r["values"])
            for r in salted_collect_set(skewed, ["scope"], "name", n_salts=8).collect()
        }
        assert salted == naive

    def test_phase1_groups_by_salt(self, spark, skewed):
        """The hot group must be spread: phase-1 aggregation keys include
        the salt, and there are two aggregation exchanges (salted partial
        + final merge), not one."""
        df = salted_collect_set(skewed, ["scope"], "name", n_salts=8)
        plan = plan_of(df)
        assert "_salt" in plan
        # two shuffles keyed differently: (scope, _salt) then (scope)
        assert plan.count("Exchange hashpartitioning") >= 2

    def test_column_expression_value(self, spark, skewed):
        got = salted_collect_set(
            skewed, ["scope"], F.upper("name"), n_salts=4, out="names"
        )
        naive = skewed.groupBy("scope").agg(
            F.array_sort(F.collect_set(F.upper("name"))).alias("names")
        )
        a = {r["scope"]: list(r["names"]) for r in got.collect()}
        b = {r["scope"]: list(r["names"]) for r in naive.collect()}
        assert a == b


class TestSaltedCountDistinct:
    def test_matches_naive(self, spark, skewed):
        naive = {
            r["scope"]: r["n"]
            for r in skewed.groupBy("scope")
            .agg(F.count_distinct("name").alias("n"))
            .collect()
        }
        salted = {
            r["scope"]: r["n_distinct"]
            for r in salted_count_distinct(skewed, ["scope"], "name", n_salts=8).collect()
        }
        assert salted == naive


class TestSkewSplitJoin:
    def test_matches_plain_join(self, spark, skewed):
        dim = skewed.groupBy("scope").agg(F.sum("weight").alias("total"))
        plain = skewed.join(dim, "scope").select("scope", "name", "total")
        split = skew_split_join(skewed, dim, "scope", ["@types"]).select(
            "scope", "name", "total"
        )
        assert sorted(map(tuple, split.collect())) == sorted(map(tuple, plain.collect()))

    def test_hot_path_is_broadcast(self, spark, skewed):
        dim = skewed.groupBy("scope").agg(F.sum("weight").alias("total"))
        split = skew_split_join(skewed, dim, "scope", ["@types"])
        plan = plan_of(split)
        assert "BroadcastHashJoin" in plan  # the hot branch

    def test_outer_join_how(self, spark, skewed):
        dim = (
            skewed.groupBy("scope")
            .agg(F.sum("weight").alias("total"))
            .where(F.col("scope") != "scope-3")
        )
        plain = skewed.join(dim, "scope", "left").select("scope", "name", "total")
        split = skew_split_join(skewed, dim, "scope", ["@types"], how="left").select(
            "scope", "name", "total"
        )
        assert sorted(
            map(tuple, split.fillna({"total": -1}).collect())
        ) == sorted(map(tuple, plain.fillna({"total": -1}).collect()))
