"""Span-derived enrichment parity — mirrors the reference's own test
matrices (src/__tests__/changelog.test.ts:185-252,
src/jsDelivr/__test__/pkgTypes.test.ts:11-107,
src/typescript/index.test.ts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from npm_search_spark.functions import spans as S
from npm_search_spark.schema import DOCUMENTS


def make_doc(doc_id, files, texts=()):
    spans = [
        {"kind": "text", "text": t, "media_ref": None, "offset": i}
        for i, t in enumerate(texts)
    ]
    base = len(spans)
    spans += [
        {
            "kind": "media",
            "text": f,
            "media_ref": f"https://cdn.jsdelivr.net/npm/{doc_id}@1.0.0{f}",
            "offset": base + i,
        }
        for i, f in enumerate(files)
    ]
    return {"doc_id": doc_id, "spans": spans}


def run(spark, docs, col):
    df = spark.createDataFrame(docs, DOCUMENTS)
    rows = df.select("doc_id", col.alias("out")).collect()
    return {r["doc_id"]: r["out"] for r in rows}


class TestChangelogFilename:
    def test_matrix(self, spark):
        docs = [
            make_doc("hit", ["/package.json", "/CHANGELOG.md"]),
            make_doc("nested", ["/pkg/CHANGELOG.md"]),
            make_doc("reject-js", ["/dist/changelog.js"]),
            make_doc("none", ["/index.js"]),
            make_doc("history", ["/HISTORY"]),
            make_doc("releases-md", ["/RELEASES.md"]),
            make_doc("first-wins", ["/a/HISTORY.md", "/CHANGELOG.md"]),
        ]
        got = run(spark, docs, S.changelog_filename(F.col("spans")))
        assert got["hit"] == "https://cdn.jsdelivr.net/npm/hit@1.0.0/CHANGELOG.md"
        assert got["nested"] == "https://cdn.jsdelivr.net/npm/nested@1.0.0/pkg/CHANGELOG.md"
        assert got["reject-js"] is None
        assert got["none"] is None
        assert got["history"] == "https://cdn.jsdelivr.net/npm/history@1.0.0/HISTORY"
        assert got["releases-md"] == "https://cdn.jsdelivr.net/npm/releases-md@1.0.0/RELEASES.md"
        # in-order first hit wins (reference loops the file list sequentially)
        assert got["first-wins"].endswith("/a/HISTORY.md")


class TestStyleTypes:
    def test_matrix(self, spark):
        cases = [
            ("a", [], [], ["none"]),
            ("b", ["/dist/style/style.min.css"], [], ["css"]),
            (
                "c",
                [
                    "/src/style/style.less",
                    "/dist/style/style.min.css",
                    "/dist/js/lib.min.js",
                    "/style.scss",
                ],
                [],
                ["less", "css", "scss"],
            ),
            ("e", ["/src/style/style.less"], ["css"], ["css", "less"]),
            ("f", ["/DIST/STYLE/STYLE.MIN.CSS"], [], ["css"]),
        ]
        docs, declared = [], {}
        for doc_id, files, style_types, _ in cases:
            docs.append(make_doc(doc_id, files))
            declared[doc_id] = style_types
        df = spark.createDataFrame(
            [{**d, "styleTypes": declared[d["doc_id"]]} for d in docs],
            "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, styleTypes array<string>",
        )
        got = {
            r["doc_id"]: r["out"]
            for r in df.select(
                "doc_id",
                S.style_types_from_files(F.col("spans"), F.col("styleTypes")).alias("out"),
            ).collect()
        }
        for doc_id, _, _, want in cases:
            assert got[doc_id] == want, doc_id

    def test_blacklist(self, spark):
        files = [
            "/dist/style/style.min.css",
            "/dist/style/_source.scss",
            "/docs/file.scss",
            "/test/file.scss",
            "/.hidden/file.scss",
            "/dist/.hidden.scss",
            "/dist/.hidden/style.scss",
        ]
        df = spark.createDataFrame(
            [{**make_doc("x", files), "styleTypes": []}],
            "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, styleTypes array<string>",
        )
        got = df.select(
            S.style_types_from_files(F.col("spans"), F.col("styleTypes")).alias("o")
        ).first()["o"]
        assert got == ["css"]


class TestModuleTypes:
    def test_matrix(self, spark):
        cases = [
            ("a", [], ["unknown"], ["none"]),
            ("b", ["/dist/style/style.min.css"], ["unknown"], ["none"]),
            ("c", ["/dist/js/lib.min.js"], ["unknown"], ["unknown"]),
            ("d", ["/dist/js/lib.min.mjs"], ["unknown"], ["unknown"]),
            ("e", ["/dist/js/lib.min.cjs"], ["unknown"], ["unknown"]),
            ("f", [], ["esm"], ["esm"]),
            ("g", [], ["esm", "cjs"], ["esm", "cjs"]),
        ]
        df = spark.createDataFrame(
            [{**make_doc(i, f), "moduleTypes": m} for i, f, m, _ in cases],
            "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, moduleTypes array<string>",
        )
        got = {
            r["doc_id"]: r["out"]
            for r in df.select(
                "doc_id",
                S.module_types_from_files(F.col("spans"), F.col("moduleTypes")).alias("out"),
            ).collect()
        }
        for doc_id, _, _, want in cases:
            assert got[doc_id] == want, doc_id

    def test_blacklist(self, spark):
        files = [
            "/dist/js/_hidden.mjs",
            "/dist/js/.hidden.mjs",
            "/docs/lib.js",
            "/test/lib.js",
            "/.hidden/lib.cjs",
            "/dist/.hidden/lib.js",
        ]
        df = spark.createDataFrame(
            [{**make_doc("x", files), "moduleTypes": ["unknown"]}],
            "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, moduleTypes array<string>",
        )
        got = df.select(
            S.module_types_from_files(F.col("spans"), F.col("moduleTypes")).alias("o")
        ).first()["o"]
        assert got == ["none"]


class TestTsSupport:
    def test_matrix(self, spark):
        # (id, files, formatted_ts, types_name, want_ts, want_dt)
        cases = [
            ("included", [], "included", None, "included", None),
            ("dts", ["/dist/x.d.ts"], "possible", None, "included", None),
            ("dt", [], "possible", "mapbox__geojson-area", "definitely-typed", "@types/mapbox__geojson-area"),
            ("nope", ["/index.js"], "possible", None, "false", None),
            # .d.ts beats definitely-typed (reference checks filelist first)
            ("both", ["/x.d.ts"], "possible", "x", "included", None),
        ]
        df = spark.createDataFrame(
            [
                {**make_doc(i, f), "fts": ts, "types_name": tn}
                for i, f, ts, tn, _, _ in cases
            ],
            "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, fts string, types_name string",
        )
        got = {
            r["doc_id"]: r["out"]
            for r in df.select(
                "doc_id",
                S.ts_support(F.col("spans"), F.col("fts"), F.col("types_name")).alias("out"),
            ).collect()
        }
        for doc_id, _, _, _, want_ts, want_dt in cases:
            assert got[doc_id]["ts"] == want_ts, doc_id
            assert got[doc_id]["definitelyTyped"] == want_dt, doc_id
