"""Deterministic sampling / split operators (north-star extensions).

Training-data pipelines need samples and splits that are (a) exactly
reproducible across runs and engines, (b) stable under repartitioning
and insertion order, and (c) cheap at 100 TB. Random-number sampling
(`df.sample`) is none of these — it depends on partition layout and
seed plumbing. The standard fix is HASH sampling: a row is selected iff
a salted md5 of its key falls below a threshold. Selection is then a
pure per-row predicate — no shuffle, no state, pushes down past column
pruning, and the SAME rows are chosen by any engine that can compute
md5 (which is what makes these queries oracle-checkable in DuckDB).

The hex-prefix comparison trick: fraction f maps to the 8-hex-char
threshold format(round(f * 16^8), '08x'); `substr(md5(salt:key),1,8) <
threshold` selects a deterministic, uniformly-distributed f of rows
with zero integer conversion — string comparison over fixed-width hex
is numeric comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_WIDTH = 8


def threshold_hex(fraction: float) -> str:
    """fraction in (0,1) -> fixed-width lowercase hex threshold."""
    return format(round(fraction * 16**_HEX_WIDTH), f"0{_HEX_WIDTH}x")


def hash_hex(key: Column, seed: str) -> Column:
    """First 8 hex chars of md5('<seed>:' || key) — the selection hash.

    NULL keys hash to NULL (F.concat propagates NULL exactly like SQL
    ``||``), so a NULL-keyed row is never selected and splits send it to
    the 'train'/otherwise branch. The previous concat_ws SKIPPED the
    NULL, hashing every NULL-keyed row to the constant md5('<seed>') —
    a sample would then keep or drop ALL of them together by seed
    accident, silently diverging from the ``selection_sql`` mirror
    (where ``'<seed>:' || NULL`` is NULL and the row always drops).
    """
    return F.substring(
        F.md5(F.concat(F.lit(seed + ":"), key.cast("string"))), 1, _HEX_WIDTH
    )


def _selected(key: Column, seed: str, fraction: float) -> Column:
    if fraction >= 1.0:
        return F.lit(True)
    if fraction <= 0.0:
        return F.lit(False)
    return hash_hex(key, seed) < F.lit(threshold_hex(fraction))


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, seed: str = "s42"
) -> DataFrame:
    """Keep a deterministic ~`fraction` of rows, selected by id hash.

    Per-row predicate only: at scale this is a codegen'd filter fused
    into the scan. Re-running, repartitioning, or porting engines keeps
    the exact same rows; changing `seed` draws an independent sample.
    """
    return df.where(_selected(F.col(id_col), seed, fraction))


def train_test_split(
    df: DataFrame, id_col: str, test_fraction: float, seed: str = "s42"
) -> DataFrame:
    """Add a 'split' column: 'test' for a deterministic ~test_fraction
    of rows, 'train' for the rest. Same hash family as
    deterministic_sample, so splits are disjoint, exhaustive, and
    reproducible — the train/held-out contract for training corpora."""
    return df.withColumn(
        "split",
        F.when(_selected(F.col(id_col), seed, test_fraction), F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: str = "s42",
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps ~fractions[s]
    of its rows (default_fraction for unlisted strata).

    The source-mixing knob of corpus construction (e.g. keep all of a
    curated source, 10% of a crawl). Still a pure per-row predicate —
    the stratum column is compared against literals, so there is no join
    and no shuffle regardless of how many strata are configured.
    """
    cond = None
    for stratum, frac in sorted(fractions.items()):
        sel = _selected(F.col(id_col), seed, frac)
        branch = F.when(F.col(strata_col) == F.lit(stratum), sel)
        cond = branch if cond is None else cond.when(
            F.col(strata_col) == F.lit(stratum), sel
        )
    keep = cond.otherwise(_selected(F.col(id_col), seed, default_fraction))
    return df.where(keep)


def selection_sql(key_sql: str, seed: str, fraction: float) -> str:
    """The DuckDB-side predicate matching `_selected` — kept next to the
    Spark implementation so the two can never drift."""
    if fraction >= 1.0:
        return "TRUE"
    if fraction <= 0.0:
        return "FALSE"
    return (
        f"substr(md5('{seed}:' || CAST({key_sql} AS VARCHAR)), 1, {_HEX_WIDTH})"
        f" < '{threshold_hex(fraction)}'"
    )
