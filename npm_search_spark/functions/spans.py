"""Span-derived enrichments as pure Catalyst column expressions.

The input table carries interleaved text+media spans per document
(BASELINE.json input_hint); media spans mirror the reference's jsDelivr
flat file lists (File {name,...}, reference src/jsDelivr/index.ts:11), with
``text`` = file path and ``media_ref`` = CDN URL. All four enrichments the
reference computes by looping over file lists in JS are expressed here as
higher-order functions (filter/exists/transform) over the spans array —
JVM-side, whole-stage-codegen-able, zero Python. Reference behaviors:

  changelog filename   src/changelog.ts:80-81,141-160 (first regex hit wins)
  .d.ts detection      src/typescript/index.ts:64-72
  module types         src/jsDelivr/pkgTypes.ts:67-90
  style types          src/jsDelivr/pkgTypes.ts:22-51
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# reference src/changelog.ts:80-81 — note the unescaped '.' before (md|markdown)
# is faithful to the reference regex (it matches any char there).
CHANGELOG_BASENAME_RE = (
    r"(?i)^(((changelogs?)|changes|history|(releases?)))((.(md|markdown))?$)"
)

# reference src/jsDelivr/pkgTypes.ts:12-20 (createFilePattern)
_BLACKLIST = r"(docs?|documentation|examples?|samples?|demos?|tests?)"


def file_pattern(extensions: list[str]) -> str:
    ext = "|".join(extensions)
    return rf"(?i)^(?:(?!/{_BLACKLIST}/)(?!/[._]).)+\.({ext})$"


STYLE_FILE_RE = file_pattern(["css", "less", "scss"])
JS_FILE_RE = file_pattern(["js", "mjs", "cjs"])


def _media(spans: Column) -> Column:
    return F.filter(spans, lambda s: s["kind"] == F.lit("media"))


def _basename(path: Column) -> Column:
    return F.element_at(F.split(path, "/"), -1)


def changelog_filename(spans: Column) -> Column:
    """First media span whose basename matches the changelog regex -> its
    CDN URL (media_ref); null when none. Order-preserving 'first' replaces
    the reference's sequential loop (src/changelog.ts:147-156)."""
    hits = F.filter(
        _media(spans),
        lambda s: _basename(s["text"]).rlike(CHANGELOG_BASENAME_RE),
    )
    return F.when(F.size(hits) > 0, F.element_at(hits, 1)["media_ref"]).otherwise(
        F.lit(None)
    )


def has_dts_file(spans: Column) -> Column:
    """any media span path ends with .d.ts (src/typescript/index.ts:64-72)."""
    return F.exists(_media(spans), lambda s: s["text"].endswith(".d.ts"))


def ts_support(spans: Column, formatted_ts: Column, types_name: Column) -> Column:
    """Final `types` struct (reference getTypeScriptSupport,
    src/typescript/index.ts:52-90): included (from formatPkg or a .d.ts in
    the file list) > definitely-typed (broadcast dim join provides
    ``types_name``) > false."""
    return (
        F.when(
            formatted_ts == F.lit("included"),
            F.struct(
                F.lit("included").alias("ts"),
                F.lit(None).cast("string").alias("definitelyTyped"),
            ),
        )
        .when(
            has_dts_file(spans),
            F.struct(
                F.lit("included").alias("ts"),
                F.lit(None).cast("string").alias("definitelyTyped"),
            ),
        )
        .when(
            types_name.isNotNull(),
            F.struct(
                F.lit("definitely-typed").alias("ts"),
                F.concat(F.lit("@types/"), types_name).alias("definitelyTyped"),
            ),
        )
        .otherwise(
            F.struct(
                F.lit("false").alias("ts"),
                F.lit(None).cast("string").alias("definitelyTyped"),
            )
        )
    )


def module_types_from_files(spans: Column, module_types: Column) -> Column:
    """reference getModuleTypes (src/jsDelivr/pkgTypes.ts:67-90): an
    'unknown' verdict downgrades to ['none'] when the file list proves there
    is no JS at all."""
    has_js = F.exists(_media(spans), lambda s: s["text"].rlike(JS_FILE_RE))
    return F.when(
        ~F.array_contains(module_types, "unknown") | has_js, module_types
    ).otherwise(F.array(F.lit("none")))


def style_types_from_files(spans: Column, style_types: Column) -> Column:
    """reference getStyleTypes (src/jsDelivr/pkgTypes.ts:22-51): union of
    declared styleTypes and lowercased extensions of style files, insertion
    -ordered; ['none'] when empty."""
    file_exts = F.transform(
        F.filter(_media(spans), lambda s: s["text"].rlike(STYLE_FILE_RE)),
        lambda s: F.lower(F.element_at(F.split(s["text"], r"\."), -1)),
    )
    merged = F.array_distinct(F.concat(style_types, file_exts))
    return F.when(F.size(merged) > 0, merged).otherwise(F.array(F.lit("none")))
