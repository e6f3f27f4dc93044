"""URL canonicalization + hashing for the frontier and the URL-seen set.

All pure Catalyst expressions (north rule: canonicalized, xxhash64-keyed
seen set). Canonicalization is deterministic and idempotent so the same
logical URL always lands in the same seen-set partition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

N_SEEN_BUCKETS = 256  # seen-set hash partitions; stable across runs


def canonicalize_url(url: Column) -> Column:
    """Lowercase scheme+host, strip default ports, fragments and trailing
    slashes. Conservative: path/query case is preserved (URLs are
    case-sensitive there)."""
    c = F.trim(url)
    # lowercase scheme://host prefix only
    c = F.concat(
        F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)),
        F.regexp_replace(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""),
    )
    # r6: 4 regex passes instead of 6 — the two default-port rules fuse
    # into one alternation (an unmatched Java regex group substitutes as
    # ""), and fragment + trailing-slash strip fuse into one pass
    # (`/*#.*$` eats slashes immediately before the fragment, which is
    # exactly what the old strip-fragment-then-strip-slashes sequence
    # produced). Port strip runs first; its (?=[/?#]|$) lookahead is
    # fragment-tolerant, and a ':443' INSIDE a fragment cannot match the
    # anchored host pattern. Byte-equivalence with the old chain is pinned
    # by tests/test_properties.py::TestCanonicalizeFusedEquivalence over an
    # adversarial scheme/host/port/path/query/fragment product corpus.
    c = F.regexp_replace(
        c,
        r"^(https://[^/:?#]+):443(?=[/?#]|$)|^(http://[^/:?#]+):80(?=[/?#]|$)",
        r"$1$2",
    )
    c = F.regexp_replace(c, r"/*#.*$|/+$", "")
    return c


def url_host(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))


def url_key(canonical_url: Column) -> Column:
    """64-bit key for the seen set (built-in xxhash64 — JVM-side)."""
    return F.xxhash64(canonical_url)


def url_bucket(canonical_url: Column, n_buckets: int = N_SEEN_BUCKETS) -> Column:
    """Stable partition bucket for seen-set co-partitioned anti-joins."""
    return F.pmod(F.xxhash64(canonical_url), F.lit(n_buckets)).cast("int")
