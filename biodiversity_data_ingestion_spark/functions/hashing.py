"""Portable hashing column helpers.

Everything is built on ``md5`` because it is available, deterministic and
IDENTICAL in Spark, DuckDB and Python — so MinHash signatures / LSH band
buckets computed here hash-match a SQL oracle exactly. Hash values are
compared lexicographically on the hex string (a uniform order-preserving
surrogate for a 128-bit integer compare), which avoids any hex->int
conversion differences between engines.

All of these are pure Catalyst expressions (whole-stage codegen, no
Python), so they run JVM-side at full speed on a cluster.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex(col: Column) -> Column:
    """Deterministic 128-bit content hash as lowercase hex."""
    return F.md5(col.cast("string"))


def word_shingles(words: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an array<string> of tokens.

    Pure expression: sequence + transform + slice — no explode, no UDF.
    Shingling is the unit step of MinHash / n-gram-Jaccard dedup
    (extension beyond the reference per BASELINE.json north star).
    """
    # slice+array_join beats n element_at lookups here: consumers embed
    # this expression many times (16 MinHash components), and the smaller
    # tree keeps whole-stage codegen from falling back to interpreted mode
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )
    # guard: Spark sequence(1, k) DESCENDS for k < 1, so short docs need
    # an explicit empty-array branch
    return F.when(F.size(words) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def portable_min_hash(shingles: Column, seed: int) -> Column:
    """One MinHash signature component: min over md5('<seed>:'||shingle).

    The min of a uniform hash over the shingle set is the classic MinHash
    estimator (Broder 1997); using the hex string order keeps it portable
    across engines. Computed per-row with array_min — no shuffle at all
    for the signature stage.
    """
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s)))
    )
