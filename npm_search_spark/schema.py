"""Canonical StructTypes for every table in the engine.

The reference is schema-on-read JSON (CouchDB docs with ``[key: string]:
any``, reference src/npm/types.ts:80-108); its only *fixed* shape is the
output record ``RawPkg`` (src/@types/pkg.ts:45-92). We mirror that split:

- ingestion tables are permissive (``raw_json`` string alongside parsed
  convenience columns),
- the post-formatPkg ``packages`` table is a strict StructType,
- union-typed reference fields (deprecated: bool|string, license:
  string|{type}, main: string|string[]|object, repository:
  string|obj|array) are normalized *inside* the Arrow UDF so the table
  schema stays fixed (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Primary input: interleaved text+media documents (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType()),       # 'text' | 'media'
        T.StructField("text", T.StringType()),       # text content | media file path
        T.StructField("media_ref", T.StringType()),  # CDN URL for media spans, null for text
        T.StructField("offset", T.IntegerType()),    # 0-based; span order is the row invariant
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN)),
    ]
)

# ---------------------------------------------------------------------------
# Fetch-stage output: registry documents (reference GetPackage,
# src/npm/types.ts:80-108) — permissive: raw JSON + parsed columns
# ---------------------------------------------------------------------------

RAW_PACKAGES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("raw_json", T.StringType()),  # the full registry doc
        T.StructField("fetched_at", T.TimestampType()),
        T.StructField("seq", T.LongType()),
    ]
)

# ---------------------------------------------------------------------------
# Strict output record (reference RawPkg, src/@types/pkg.ts:45-92).
# Union types are flattened: deprecated -> (deprecated:string, isDeprecated,
# deprecatedReason); types -> struct<ts:string, definitelyTyped:string> with
# ts in {'included','possible','false','definitely-typed'}.
# ---------------------------------------------------------------------------

OWNER = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("avatar", T.StringType()),
        T.StructField("link", T.StringType()),
    ]
)

REPOSITORY = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("user", T.StringType()),
        T.StructField("project", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("head", T.StringType()),
        T.StructField("branch", T.StringType()),
        T.StructField("type", T.StringType()),
    ]
)

GITHUB_REPO = T.StructType(
    [
        T.StructField("user", T.StringType()),
        T.StructField("project", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("head", T.StringType()),
    ]
)

TYPES = T.StructType(
    [
        T.StructField("ts", T.StringType()),  # included|possible|false|definitely-typed
        T.StructField("definitelyTyped", T.StringType()),
    ]
)

SEARCH_INTERNAL = T.StructType(
    [
        T.StructField("alternativeNames", T.ArrayType(T.StringType())),
        T.StructField("popularAlternativeNames", T.ArrayType(T.StringType())),
    ]
)

PACKAGE = T.StructType(
    [
        T.StructField("objectID", T.StringType(), False),
        T.StructField("rev", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("downloadsLast30Days", T.LongType()),
        T.StructField("downloadsRatio", T.DoubleType()),
        T.StructField("humanDownloadsLast30Days", T.StringType()),
        T.StructField("jsDelivrHits", T.LongType()),
        T.StructField("popular", T.BooleanType()),
        T.StructField("version", T.StringType()),
        T.StructField("versions", T.MapType(T.StringType(), T.StringType())),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("description", T.StringType()),
        T.StructField("dependencies", T.MapType(T.StringType(), T.StringType())),
        T.StructField("devDependencies", T.MapType(T.StringType(), T.StringType())),
        T.StructField("originalAuthor", T.StringType()),  # dynamic -> kept as JSON
        T.StructField("repository", REPOSITORY),
        T.StructField("githubRepo", GITHUB_REPO),
        T.StructField("gitHead", T.StringType()),
        T.StructField("readme", T.StringType()),
        T.StructField("owner", OWNER),
        T.StructField("deprecated", T.StringType()),  # 'false' | reason | 'true'
        T.StructField("isDeprecated", T.BooleanType()),
        T.StructField("deprecatedReason", T.StringType()),
        T.StructField("isSecurityHeld", T.BooleanType()),
        T.StructField("homepage", T.StringType()),
        T.StructField("license", T.StringType()),
        T.StructField("keywords", T.ArrayType(T.StringType())),
        T.StructField("computedKeywords", T.ArrayType(T.StringType())),
        T.StructField("computedMetadata", T.MapType(T.StringType(), T.StringType())),
        T.StructField("created", T.LongType()),   # epoch ms
        T.StructField("modified", T.LongType()),  # epoch ms
        T.StructField("lastPublisher", OWNER),
        T.StructField("owners", T.ArrayType(OWNER)),
        T.StructField("bin", T.MapType(T.StringType(), T.StringType())),
        T.StructField("humanDependents", T.StringType()),
        T.StructField("dependents", T.LongType()),
        T.StructField("types", TYPES),
        T.StructField("moduleTypes", T.ArrayType(T.StringType())),
        T.StructField("styleTypes", T.ArrayType(T.StringType())),
        T.StructField("changelogFilename", T.StringType()),
        T.StructField("lastCrawl", T.StringType()),  # ISO-8601
        T.StructField("_revision", T.LongType()),
        T.StructField("_searchInternal", SEARCH_INTERNAL),
    ]
)

# Enriched record (reference FinalPkg, src/@types/pkg.ts:94-100)
FINAL_EXTRA = [
    T.StructField("_oneTimeDataToUpdateAt", T.LongType()),
    T.StructField("_periodicDataUpdatedAt", T.LongType()),
    T.StructField("_jsDelivrPopularity", T.LongType()),
    T.StructField("_downloadsMagnitude", T.LongType()),
    T.StructField("_popularName", T.StringType()),
]
FINAL_PACKAGE = T.StructType(PACKAGE.fields + FINAL_EXTRA)

# ---------------------------------------------------------------------------
# Frontier (engine-internal; FIXTURES.md §5). The queue that replaces the
# reference's Algolia bootstrap/main queue indices (src/npm/Prefetcher.ts:
# 95-102, src/watch.ts:134-141).
# ---------------------------------------------------------------------------

LINEAGE = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("generation", T.IntegerType()),
    ]
)

FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),   # canonicalized
        T.StructField("host", T.StringType()),
        T.StructField("kind", T.StringType()),         # registry_doc|file_list|changelog_probe
        T.StructField("doc_id", T.StringType()),
        T.StructField("priority", T.DoubleType()),     # download-count-weighted (W4)
        T.StructField("retries", T.IntegerType()),
        T.StructField("state", T.StringType()),        # pending|in_flight|done|not_found|lost
        T.StructField("next_attempt_at", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("lineage", LINEAGE),
    ]
)

# Quarantine sink rows: FRONTIER plus provenance — which job/generation
# moved the row out of the live queue (reference tags moved records
# `movedBy` when shifting them to the not-found/lost indices,
# src/algolia/index.ts:64-93)
QUARANTINE = T.StructType(
    [*FRONTIER.fields, T.StructField("moved_by", T.StringType())]
)

# One-time changelog-probe memo (reference OneTimeBackgroundIndexer memoizes
# per name@version, src/indexers/OneTimeBackgroundIndexer.ts:33-40)
ONE_TIME = T.StructType(
    [
        T.StructField("objectID", T.StringType(), False),  # name@version
        T.StructField("changelogFilename", T.StringType()),
    ]
)

# Streaming change feed (reference DatabaseChangesResultItem, consumed
# src/watch.ts:118-141)
CHANGES = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("id", T.StringType(), False),
        T.StructField("deleted", T.BooleanType()),
        T.StructField("rev", T.StringType()),
    ]
)

# Dimension tables (broadcast joins, FIXTURES.md §4)
JSDELIVR_HITS = T.StructType(
    [T.StructField("name", T.StringType(), False), T.StructField("hits", T.LongType())]
)
DEFINITELY_TYPED = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("types_name", T.StringType()),
    ]
)
NPM_DOWNLOADS = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("downloads_last_30d", T.LongType()),
    ]
)

# Crawl state (reference State, src/StateManager.ts:6-12)
STATE = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("bootstrap_done", T.BooleanType()),
        T.StructField("bootstrap_last_done", T.LongType()),
        T.StructField("bootstrap_last_id", T.StringType()),
        T.StructField("stage", T.StringType()),  # bootstrap | watch
        T.StructField("generation", T.IntegerType()),
        T.StructField("snapshot_id", T.LongType()),
    ]
)
