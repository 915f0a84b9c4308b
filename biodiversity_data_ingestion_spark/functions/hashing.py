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


def shingle_hash64(shingles: Column) -> Column:
    """Map an array of shingle STRINGS to a distinct array of 60-bit
    BIGINT hashes (the 15-hex-char md5 prefix).

    The inverted-index near-dup path shuffles every (shingle, doc)
    posting; at 100 TB the shingle text (~20-40 bytes of words) is the
    dominant shuffle payload, so the index is built over a fixed-width
    8-byte surrogate instead. Portable: the DuckDB oracle applies
    ``list_distinct(list_transform(sh, s -> CAST(('0x' ||
    substr(md5(s), 1, 15)) AS BIGINT)))`` — bit-identical md5 on both
    engines, so the (astronomically rare, ~n^2/2^61 birthday-bound)
    collisions merge the same shingles on both sides and Jaccard parity
    HOLDS by construction.
    """
    return F.array_distinct(
        F.transform(
            shingles,
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint"),
        )
    )


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

    NOTE: `minhash_signatures` no longer calls this per component — one
    md5 pass per component is 4x the hashing cost of the chunked scheme
    below (`seeded_md5_array` + `chunk_min`). Kept as the single-component
    reference implementation.
    """
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s)))
    )


def seeded_md5_array(shingles: Column, seed: int) -> Column:
    """md5('<seed>:' || s) for every shingle — ONE hash pass whose 32 hex
    chars carry four independent 32-bit (8-hex-char) uniform hashes."""
    return F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s)))


def chunk_min(hashes: Column, chunk: int) -> Column:
    """MinHash component from pre-computed hashes: min over the chunk-th
    8-hex slice of each hash. Fixed-length lowercase hex compares
    lexicographically == numerically, identically in Spark and DuckDB, so
    the component (and any LSH bucket built from it) is oracle-portable.
    """
    return F.array_min(F.transform(hashes, lambda h: F.substring(h, 1 + 8 * chunk, 8)))
