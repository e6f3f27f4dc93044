"""Text analysis for large-scale training-data pipelines.

Language-ID (stopword n-gram heuristic), quality scoring, token counting,
and document fingerprinting over a ``documents(doc_id, text, ...)`` table.
All pure Catalyst expressions (codegen, shuffle-free row-wise maps) —
each has an ANSI-SQL twin in ``__spark_entry__.oracle_sql`` so correctness
is DuckDB-checked at every scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small, fixed stopword lists (public knowledge) for the lang-ID heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "los", "por"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "les", "pour"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein", "eine", "von"],
}


def tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish counting: splits on whitespace AND punctuation AND
    case/digit boundaries — a cheap deterministic proxy for BPE length."""
    pieces = F.split(
        F.regexp_replace(
            F.regexp_replace(text, r"([a-z])([A-Z])", r"$1 $2"),
            r"([A-Za-z])(\d)|(\d)([A-Za-z])",
            r"$1$3 $2$4",
        ),
        r"[\s\p{Punct}]+",
    )
    return F.size(F.filter(pieces, lambda t: t != ""))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, n_sw / F.size(toks)).otherwise(F.lit(0.0))


def lang_scores(text: Column) -> Column:
    """map<lang, stopword ratio> for each candidate language."""
    return F.create_map(
        *[x for lang in STOPWORDS for x in (F.lit(lang), stopword_ratio(text, lang))]
    )


def lang_id(text: Column) -> Column:
    """argmax over the per-language stopword ratios, ties -> lexicographic
    smallest language (deterministic)."""
    scored = F.array(
        *[
            F.struct(stopword_ratio(text, lang).alias("score"), F.lit(lang).alias("lang"))
            for lang in sorted(STOPWORDS)
        ]
    )
    max_score = F.array_max(F.transform(scored, lambda e: e["score"]))
    winners = F.filter(scored, lambda e: e["score"] == max_score)
    return F.array_min(F.transform(winners, lambda e: e["lang"]))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    n_punct = F.length(F.regexp_replace(text, r"[^\p{Punct}]", ""))
    return F.when(n > 0, n_punct / n).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    return F.when(
        F.size(toks) > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)) / F.size(toks),
    ).otherwise(F.lit(0.0))


def quality_score(text: Column, lang: str = "en") -> Column:
    """Composite [0,1] quality heuristic: enough tokens, sane word lengths,
    some stopwords, not punctuation soup."""
    n_tok = token_count(text)
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    sw_score = F.least(stopword_ratio(text, lang) * 4, F.lit(1.0))
    wl = mean_word_length(text)
    wl_score = F.when((wl >= 3) & (wl <= 10), F.lit(1.0)).otherwise(F.lit(0.3))
    punct_score = F.when(punct_ratio(text) < 0.2, F.lit(1.0)).otherwise(F.lit(0.2))
    return F.round(
        0.4 * len_score + 0.2 * sw_score + 0.2 * wl_score + 0.2 * punct_score, 6
    )


def normalize_text(text: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint of normalized text (md5 hex — same
    function exists in DuckDB for the oracle)."""
    return F.md5(normalize_text(text))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_subword_tokens"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio_en"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(mean_word_length(t), 6).alias("mean_word_len"),
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )
