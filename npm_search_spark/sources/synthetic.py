"""Deterministic synthetic crawl universe (no external data).

Generates, at any scale, the tables a crawl run consumes:

  raw_docs   (doc_id, raw_json)  GetPackage-shaped registry docs
  documents  (doc_id, spans)     interleaved text+media spans (input_hint)
  dims       jsdelivr_hits / definitely_typed / npm_downloads
  changes    (seq, id, deleted, rev) replication feed

Everything is a pure function of (doc index, seed) — hash-based, no RNG
state — so generation is distributed (spark.range + mapInPandas /
column exprs), reproducible across parallelism levels, and any subset can
be regenerated independently. Doc properties (repo host, file list shape,
downloads, deprecation, …) are chosen to exercise every enrichment path:
changelog hits at several ranks, .d.ts files, style/js patterns,
blacklisted dirs, scoped names (hot-partition skew), security-held repos.
"""

from __future__ import annotations

import hashlib
import json
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
SCOPES = ["@algolia", "@babel", "@types", "@vue", "@angular"]
HOSTS = [None, "github.com", "gitlab.com", "bitbucket.org"]

# candidate filenames probed for changelogs (reference src/changelog.ts:57-77)
FILE_OPTIONS = [
    "CHANGELOG.md", "ChangeLog.md", "changelog.md", "changelog.markdown",
    "CHANGELOG", "ChangeLog", "changelog", "CHANGES.md", "changes.md",
    "Changes.md", "CHANGES", "changes", "Changes", "HISTORY.md", "history.md",
    "HISTORY", "history", "RELEASES.md", "RELEASES",
]


def _h(*parts) -> int:
    b = hashlib.md5(("|".join(str(p) for p in parts) + f"|{SEED}").encode()).digest()
    return int.from_bytes(b[:8], "big")


def pkg_name(i: int) -> str:
    # ~30% scoped names: the hot '@scope/' prefixes create realistic key skew
    h = _h(i, "name")
    if h % 10 < 3:
        return f"{SCOPES[h % len(SCOPES)]}/pkg-{i}"
    suffix = ["", ".js", "js", ".css", "css"][h % 17 % 5] if h % 7 == 0 else ""
    return f"pkg-{i}{suffix}"


def pkg_props(i: int) -> dict:
    """All synthetic properties of package i, derived by hashing."""
    name = pkg_name(i)
    h = _h(i, "props")
    host = HOSTS[h % len(HOSTS)]
    version = f"{h % 9}.{(h >> 8) % 10}.{(h >> 16) % 10}"
    n_files = h % 12
    files = []
    for j in range(n_files):
        fh = _h(i, "file", j)
        kind = fh % 10
        if kind < 4:
            files.append(f"/dist/mod{j}.js")
        elif kind < 5:
            files.append(f"/dist/mod{j}.mjs")
        elif kind < 6:
            files.append(f"/src/style{j}.css" if fh % 2 else f"/src/style{j}.scss")
        elif kind < 7:
            files.append(f"/types/x{j}.d.ts")
        elif kind < 8:
            files.append(f"/docs/guide{j}.js")  # blacklisted dir
        else:
            files.append(f"/lib/util{j}.js")
    if h % 5 == 0:
        files.insert(0, "/CHANGELOG.md")
    # changelog present in the git repo (probe hop): which candidate wins
    repo_changelog_rank = (h >> 24) % len(FILE_OPTIONS) if (h >> 20) % 3 == 0 else None
    return {
        "name": name,
        "version": version,
        "host": host,
        "files": files,
        "downloads": (h % 1000) ** 2 + (1_000_000 if h % 97 == 0 else 0),
        "jsdelivr_hits": (h >> 4) % 50_000 + (5_000_000 if h % 89 == 0 else 0),
        "definitely_typed": h % 13 == 0,
        "deprecated": "no longer maintained" if h % 31 == 0 else None,
        "repo_changelog_rank": repo_changelog_rank,
        "keywords": [f"kw{h % 20}", f"kw{(h >> 3) % 20}"],
        "fetch_fail": h % 37 == 0,       # transient fetch error (retry path)
        "not_found": h % 41 == 0,        # 404 (dead-letter path)
    }


def make_raw_doc(i: int) -> tuple[str, str]:
    p = pkg_props(i)
    name, version = p["name"], p["version"]
    created = f"201{_h(i, 'c') % 10}-0{_h(i, 'c2') % 9 + 1}-15T10:00:00.000Z"
    modified = f"202{_h(i, 'm') % 6}-0{_h(i, 'm2') % 9 + 1}-20T12:30:00.000Z"
    repo = (
        {"type": "git", "url": f"https://{p['host']}/user-{i % 1000}/{name.split('/')[-1]}.git"}
        if p["host"]
        else None
    )
    ver_doc = {
        "name": name,
        "version": version,
        "description": f"synthetic package {name}",
        "main": "dist/index.js" if _h(i, "main") % 3 else "dist/index.mjs",
        "_npmUser": {"name": f"user{i % 500}", "email": f"user{i % 500}@example.com"},
        "maintainers": [{"name": f"user{i % 500}", "email": f"user{i % 500}@example.com"}],
        "keywords": p["keywords"],
        "license": "MIT",
    }
    if repo:
        ver_doc["repository"] = repo
    if p["deprecated"]:
        ver_doc["deprecated"] = p["deprecated"]
    if _h(i, "types") % 11 == 0:
        ver_doc["types"] = "dist/index.d.ts"
    doc = {
        "_id": name,
        "_rev": f"{_h(i, 'rev') % 90 + 1}-{hashlib.md5(name.encode()).hexdigest()}",
        "name": name,
        "description": ver_doc["description"],
        "dist-tags": {"latest": version},
        "versions": {version: ver_doc},
        "time": {"created": created, "modified": modified, version: modified},
        "maintainers": ver_doc["maintainers"],
        "readme": f"# {name}\n\nsynthetic readme for {name}. " * (_h(i, "rd") % 5 + 1),
        "author": {"name": f"author-{i % 300}"},
    }
    return name, json.dumps(doc)


def cdn_url(name: str, version: str, path: str) -> str:
    return f"https://cdn.jsdelivr.net/npm/{name}@{version}{path}"


def make_spans(i: int) -> list[dict]:
    p = pkg_props(i)
    spans = [
        {"kind": "text", "text": f"synthetic package {p['name']}", "media_ref": None, "offset": 0},
        {"kind": "text", "text": f"# {p['name']} readme", "media_ref": None, "offset": 1},
    ]
    for j, f in enumerate(p["files"]):
        spans.append(
            {
                "kind": "media",
                "text": f,
                "media_ref": cdn_url(p["name"], p["version"], f),
                "offset": 2 + j,
            }
        )
    return spans


# ---------------------------------------------------------------------------
# distributed generators
# ---------------------------------------------------------------------------


def raw_docs(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [make_raw_doc(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["doc_id", "raw_json"])

    rng = spark.range(n, numPartitions=partitions)
    return rng.mapInPandas(gen, schema="doc_id string, raw_json string")


def documents(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [(pkg_name(int(i)), make_spans(int(i))) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    rng = spark.range(n, numPartitions=partitions)
    return rng.mapInPandas(
        gen,
        schema="doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )


def dims(spark: SparkSession, n: int) -> dict[str, DataFrame]:
    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                p = pkg_props(int(i))
                rows.append(
                    (
                        p["name"],
                        p["jsdelivr_hits"],
                        p["downloads"],
                        p["name"].lstrip("@").replace("/", "__")
                        if p["definitely_typed"]
                        else None,
                    )
                )
            yield pd.DataFrame(rows, columns=["name", "hits", "downloads_last_30d", "types_name"])

    all_ = spark.range(n).mapInPandas(
        gen, schema="name string, hits long, downloads_last_30d long, types_name string"
    ).cache()
    return {
        "jsdelivr_hits": all_.select("name", "hits"),
        "npm_downloads": all_.select("name", "downloads_last_30d"),
        "definitely_typed": all_.where(F.col("types_name").isNotNull()).select(
            "name", "types_name"
        ),
    }


def repo_changelogs(spark: SparkSession, n: int) -> DataFrame:
    """(name, filename): which changelog candidate exists in each package's
    git repo — ground truth for the hop-3 HEAD-probe simulation."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                p = pkg_props(int(i))
                if p["repo_changelog_rank"] is not None and p["host"]:
                    rows.append((p["name"], FILE_OPTIONS[p["repo_changelog_rank"]]))
            yield pd.DataFrame(rows, columns=["name", "filename"])

    return spark.range(n).mapInPandas(gen, schema="name string, filename string")


def robots(spark: SparkSession) -> DataFrame:
    """Synthetic robots.txt rules per host: (host, disallow array of path
    prefixes). Deterministic; blocks a recognizable slice of URLs so the
    robots filter is exercised (gitlab raw paths of users ending in '7',
    one jsDelivr scope)."""
    rows = [
        ("gitlab.com", ["/user-7", "/user-17", "/user-27"]),
        ("cdn.jsdelivr.net", ["/npm/@angular/"]),
        ("bitbucket.org", ["/user-99"]),
    ]
    return spark.createDataFrame(rows, "host string, disallow array<string>")


def universe(spark: SparkSession, n: int, partitions: int | None = None) -> dict[str, DataFrame]:
    """The full synthetic crawl universe for a Crawl run."""
    d = dims(spark, n)
    return {
        "raw_docs": raw_docs(spark, n, partitions),
        "documents": documents(spark, n, partitions),
        "repo_changelogs": repo_changelogs(spark, n),
        "robots": robots(spark),
        **d,
    }


def changes(spark: SparkSession, n_docs: int, n_changes: int, start_seq: int = 1) -> DataFrame:
    """Replication feed: random doc touched per seq, ~5% deletes, with
    duplicate ids inside windows (last-wins dedup path, watch.ts:119-126)."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for s in pdf["id"]:
                s = int(s)
                h = _h("chg", s)
                i = h % n_docs
                rows.append(
                    (
                        start_seq + s,
                        pkg_name(i),
                        h % 20 == 0,
                        f"{h % 90 + 1}-{hashlib.md5(str(h).encode()).hexdigest()}",
                    )
                )
            yield pd.DataFrame(rows, columns=["seq", "id", "deleted", "rev"])

    return spark.range(n_changes).mapInPandas(
        gen, schema="seq long, id string, deleted boolean, rev string"
    )
