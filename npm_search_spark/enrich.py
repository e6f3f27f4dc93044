"""Enrichment stage: broadcast dim joins + span-derived metadata.

Re-creates the reference's saveDoc/addMetaData pipeline
(src/saveDocs.ts:16-151) as one declarative DataFrame stage:

  J1 pkg ⟕ jsdelivr_hits     (popular = top-1k rank, W1/A3)
  J2 pkg ⟕ npm_downloads     (computeDownload, src/npm/index.ts:240-270)
  J3 pkg ⟕ definitely_typed  (@types lookup, src/typescript/index.ts:42-83)
  P9-P11 span-derived changelog/.d.ts/module/style types (functions.spans)
  popularAlternativeNames gating (src/saveDocs.ts:141-151)

Scale notes: all three dims are small (≤ a few 1e6 rows) -> explicit
``F.broadcast`` so the stage is shuffle-free regardless of packages-table
size. Security-held packages skip enrichment via when() guards
(src/saveDocs.ts:46-48) without splitting the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .functions import spans as S

POPULAR_DOWNLOADS_RATIO = 0.005  # reference src/config.ts:167
ALT_NAMES_NPM_DOWNLOADS_THRESHOLD = 5000  # src/config.ts:184
ALT_NAMES_JSDELIVR_HITS_THRESHOLD = 10000  # src/config.ts:185
JSDELIVR_POPULAR_TOP_K = 1000  # src/jsDelivr/index.ts:38


def human_number_col(n: Column) -> Column:
    """numeral(n).format('0.[0]a') as a Catalyst expression (F3): one
    optional decimal, trailing .0 dropped, k/m/b/t suffixes."""

    def plain(v: Column) -> Column:
        # avoid format_number's thousands separators
        return F.regexp_replace(F.round(v, 1).cast("string"), r"\.0$", "")

    n = n.cast("double")
    return (
        F.when(F.abs(n) >= 1e12, F.concat(plain(n / 1e12), F.lit("t")))
        .when(F.abs(n) >= 1e9, F.concat(plain(n / 1e9), F.lit("b")))
        .when(F.abs(n) >= 1e6, F.concat(plain(n / 1e6), F.lit("m")))
        .when(F.abs(n) >= 1e3, F.concat(plain(n / 1e3), F.lit("k")))
        .otherwise(plain(n))
    )


def rank_jsdelivr_hits(hits_dim: DataFrame) -> DataFrame:
    """(name, hits) -> (name, hits, popular): top-1000 by hits desc
    (reference src/jsDelivr/index.ts:37-39). The dim is small; the global
    window is a single-partition sort over ~1e6 rows, computed once and
    broadcast afterwards."""
    w = Window.orderBy(F.desc("hits"), F.asc("name"))
    return hits_dim.select(
        "name",
        "hits",
        (F.row_number().over(w) <= JSDELIVR_POPULAR_TOP_K).alias("jsdelivr_popular"),
    )


def enrich_packages(
    pkgs: DataFrame,
    hits_ranked: DataFrame,
    definitely_typed: DataFrame,
    downloads: DataFrame,
    total_npm_downloads: int,
    now_day_ms: int,
) -> DataFrame:
    """``pkgs`` must carry the PACKAGE columns plus a ``spans`` column
    (the document's interleaved text+media spans). Returns FINAL_PACKAGE
    columns (+spans dropped)."""
    held = F.col("isSecurityHeld")

    df = (
        pkgs.join(F.broadcast(hits_ranked), "name", "left")
        .join(
            F.broadcast(
                definitely_typed.withColumnRenamed("name", "dt_name")
            ),
            F.col("name") == F.col("dt_name"),
            "left",
        )
        .join(
            F.broadcast(
                downloads.select(
                    F.col("name").alias("dl_name"),
                    F.col("downloads_last_30d").alias("dl_30d"),
                )
            ),
            F.col("name") == F.col("dl_name"),
            "left",
        )
    )

    jsdelivr_hits = F.coalesce(F.col("hits"), F.lit(0))
    hit_popular = F.coalesce(F.col("jsdelivr_popular"), F.lit(False))
    # computeDownload (src/npm/index.ts:240-270): no-op when either side of
    # the ratio is missing/zero
    if total_npm_downloads:
        has_dl = F.col("dl_30d").isNotNull() & (F.col("dl_30d") > 0)
    else:
        has_dl = F.lit(False)
    dl_ratio = F.round(F.col("dl_30d") / F.lit(total_npm_downloads or 1) * 100, 4)
    dl_popular = has_dl & (dl_ratio > POPULAR_DOWNLOADS_RATIO)
    popular = dl_popular | hit_popular

    changelog = S.changelog_filename(F.col("spans"))
    has_files = F.size(S._media(F.col("spans"))) > 0
    needs_one_time = changelog.isNull() | ~has_files

    has_few_downloads = (
        F.coalesce(F.col("dl_30d"), F.lit(0)) <= ALT_NAMES_NPM_DOWNLOADS_THRESHOLD
    ) & (jsdelivr_hits <= ALT_NAMES_JSDELIVR_HITS_THRESHOLD)
    add_popular_alt = popular | (
        ~F.col("isDeprecated") & ~held & ~has_few_downloads
    )

    guarded = lambda c, orig: F.when(held, orig).otherwise(c)  # noqa: E731
    guarded_null = lambda c, t: F.when(held, F.lit(None).cast(t)).otherwise(c)  # noqa: E731

    enriched = df.select(
        F.col("doc_id") if "doc_id" in df.columns else F.lit(None).alias("doc_id"),
        *[
            F.col(c)
            for c in pkgs.columns
            if c
            not in (
                "doc_id",
                "spans",
                "downloadsLast30Days",
                "downloadsRatio",
                "humanDownloadsLast30Days",
                "jsDelivrHits",
                "popular",
                "types",
                "moduleTypes",
                "styleTypes",
                "changelogFilename",
                "_searchInternal",
            )
        ],
        guarded(
            F.when(has_dl, F.col("dl_30d")).otherwise(F.col("downloadsLast30Days")),
            F.col("downloadsLast30Days"),
        ).alias("downloadsLast30Days"),
        guarded(
            F.when(has_dl, dl_ratio).otherwise(F.col("downloadsRatio")),
            F.col("downloadsRatio"),
        ).alias("downloadsRatio"),
        guarded(
            F.when(has_dl, human_number_col(F.col("dl_30d"))).otherwise(
                F.col("humanDownloadsLast30Days")
            ),
            F.col("humanDownloadsLast30Days"),
        ).alias("humanDownloadsLast30Days"),
        guarded(jsdelivr_hits, F.col("jsDelivrHits")).alias("jsDelivrHits"),
        guarded(popular, F.col("popular")).alias("popular"),
        guarded(
            S.ts_support(F.col("spans"), F.col("types.ts"), F.col("types_name")),
            F.col("types"),
        ).alias("types"),
        guarded(
            S.module_types_from_files(F.col("spans"), F.col("moduleTypes")),
            F.col("moduleTypes"),
        ).alias("moduleTypes"),
        guarded(
            S.style_types_from_files(F.col("spans"), F.col("styleTypes")),
            F.col("styleTypes"),
        ).alias("styleTypes"),
        guarded(changelog, F.col("changelogFilename")).alias("changelogFilename"),
        guarded(
            F.struct(
                F.col("_searchInternal.alternativeNames").alias("alternativeNames"),
                F.when(
                    add_popular_alt, F.col("_searchInternal.alternativeNames")
                )
                .otherwise(F.array().cast("array<string>"))
                .alias("popularAlternativeNames"),
            ),
            F.col("_searchInternal"),
        ).alias("_searchInternal"),
        guarded_null(
            F.when(needs_one_time, F.lit(now_day_ms)).otherwise(F.lit(0)), "long"
        ).alias("_oneTimeDataToUpdateAt"),
        guarded_null(
            F.when(has_dl, F.lit(now_day_ms)).otherwise(F.lit(0)), "long"
        ).alias("_periodicDataUpdatedAt"),
        guarded_null(
            F.greatest(
                F.length(jsdelivr_hits.cast("string")) - 3, F.lit(0)
            ).cast("long"),
            "long",
        ).alias("_jsDelivrPopularity"),
        guarded_null(
            F.when(has_dl, F.length(F.col("dl_30d").cast("string")))
            .otherwise(F.lit(0))
            .cast("long"),
            "long",
        ).alias("_downloadsMagnitude"),
        guarded_null(
            F.when(popular, F.col("name")).otherwise(F.lit(None).cast("string")),
            "string",
        ).alias("_popularName"),
    )
    return enriched
