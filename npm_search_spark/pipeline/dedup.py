"""Deduplication operators for training-data pipelines at 100 TB scale.

  exact            hash-groupBy on a normalized-content fingerprint
  n-gram Jaccard   inverted-index self-join (explode ngram -> equi-join ->
                   shared/union counting) — the scalable exact method
  MinHash + LSH    shingles -> 64-perm signature (pure column exprs,
                   array_min over hashed ngrams) -> banded buckets ->
                   candidate pairs -> exact-Jaccard verification
  SimHash          64-bit bit-vote fingerprint via Arrow-vectorized numpy,
                   near-dup = small Hamming distance within buckets

Scale notes: every method is shuffle-bounded by its join key (fingerprint /
ngram / band bucket), never all-pairs. The MinHash signature is computed
JVM-side (NUM_PERM array_min expressions over the ngram array — no Python,
no explode). LSH bands turn the quadratic pair search into an equi-join;
the exact verification joins only candidate pairs.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import normalize_text

NUM_PERM = 64
BANDS = 16  # 16 bands x 4 rows: P(candidate | j=0.9) ~ 1 - (1-0.9^4)^16 ~ 0.999


def word_ngrams(text, n: int = 3):
    toks = F.filter(F.split(normalize_text(text), " "), lambda t: t != "")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of documents with identical normalized content.
    Returns (fingerprint, n_docs, doc_ids, keeper)."""
    return (
        df.select(F.col("doc_id"), F.md5(normalize_text(F.col(text_col))).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
            F.min("doc_id").alias("keeper"),
        )
        .where(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one representative (min doc_id) per identical content."""
    w = Window.partitionBy(F.md5(normalize_text(F.col(text_col)))).orderBy("doc_id")
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (inverted index)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame, threshold: float, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """All pairs (a < b) with ngram-Jaccard >= threshold.
    Inverted-index join: |pairs considered| = sum over ngrams of df^2 —
    bounded by content overlap, not n^2."""
    grams = df.select(
        F.col("doc_id"), word_ngrams(F.col(text_col), n).alias("grams")
    ).withColumn("n_grams", F.size("grams"))
    inv = grams.select("doc_id", "n_grams", F.explode("grams").alias("gram"))
    a = inv.alias("a")
    b = inv.alias("b")
    shared = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_grams").alias("na"),
            F.col("b.n_grams").alias("nb"),
        )
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.withColumn(
            "jaccard",
            F.round(F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(grams_col):
    """NUM_PERM-wide signature: min over murmur3(gram, perm_idx) per
    permutation — a single nested transform so the (possibly expensive)
    grams expression is evaluated once per row, not once per permutation
    (64 inlined copies blow codegen up ~100x)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(NUM_PERM - 1)),
        lambda i: F.array_min(F.transform(grams_col, lambda g: F.hash(g, i))),
    )


def doc_grams(df: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, grams) materialized once — the signature transform iterates
    64 permutations over it, so an inline grams expression would be
    re-evaluated 64x per row."""
    return df.select(
        F.col("doc_id"), word_ngrams(F.col(text_col), n).alias("grams")
    ).localCheckpoint(eager=False)


def minhash_lsh_candidates(
    df: DataFrame, n: int = 3, text_col: str = "text", grams: DataFrame | None = None
) -> DataFrame:
    """Candidate pairs sharing at least one LSH band bucket."""
    rows = NUM_PERM // BANDS
    if grams is None:
        grams = doc_grams(df, n, text_col)
    sig = grams.select("doc_id", minhash_signature(F.col("grams")).alias("sig"))
    # one transform referencing sig once — per-band F.array(...) expressions
    # would re-inline the whole signature computation per band after
    # projection collapse (BANDS x NUM_PERM blowup)
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(BANDS - 1)),
                lambda b: F.hash(F.slice(F.col("sig"), b * rows + 1, rows)),
            )
        ).alias("band", "bucket"),
    ).localCheckpoint(eager=False)
    # materialized: the self-join below would otherwise duplicate the whole
    # signature pipeline per side and the combined expression tree blows
    # past codegen limits (observed ~60x slowdown)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_dedup_pairs(
    df: DataFrame, threshold: float = 0.9, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """LSH candidates verified by exact Jaccard — final near-dup pairs."""
    grams = doc_grams(df, n, text_col)
    cands = minhash_lsh_candidates(df, n, text_col, grams=grams)
    ga = grams.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("ga"))
    gb = grams.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("gb"))
    return (
        cands.join(ga, "doc_a")
        .join(gb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("ga", "gb"))
                / F.size(F.array_union("ga", "gb")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash (Arrow-vectorized)
# ---------------------------------------------------------------------------


def simhash_signatures(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash long): 64-bit bit-vote over token hashes, numpy-
    vectorized inside mapInPandas (per-doc loop is O(tokens) python-free)."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def simhash(text: str) -> int:
            toks = text.lower().split()
            if not toks:
                return 0
            # deterministic 64-bit token hashes via md5 (no Python hash seed)
            import hashlib

            hs = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                    for t in toks
                ),
                dtype=np.uint64,
                count=len(toks),
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
            votes = bits.sum(axis=0) * 2 - len(hs)
            out = np.uint64(0)
            for i in np.nonzero(votes > 0)[0]:
                out |= np.uint64(1) << np.uint64(i)
            return int(out.astype(np.int64))

        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "simhash": [simhash(t or "") for t in pdf[text_col]]}
            )

    return df.select("doc_id", text_col).mapInPandas(run, schema="doc_id long, simhash long")


def simhash_near_pairs(df: DataFrame, max_hamming: int = 3, text_col: str = "text") -> DataFrame:
    """Near-dup pairs by SimHash: block on 4 x 16-bit chunks (a pair within
    hamming<=3 shares at least one identical chunk), verify exact distance."""
    sigs = simhash_signatures(df, text_col)
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
