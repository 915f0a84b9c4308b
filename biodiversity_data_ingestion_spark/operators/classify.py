"""Multi-way classification split (reference parity).

P1 `classify_samples` routes each record into exactly one of four
categories via an ordered rule chain, with error routing for malformed
rows (beam/src/dependencies/utils/map_functions.py:20-59, wired with
tagged outputs at my_pipeline.py:56-64).

Spark-first shape: ONE pass adding a `category` column (when-chain);
branches are cheap filters on it (or a partitionBy(category) write).
Tagged side outputs / dead-letter channels collapse into the same
mechanism — no second scan, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def classify(
    df: DataFrame,
    rules: list[tuple[Column, str]],
    default: str,
    out_col: str = "category",
) -> DataFrame:
    """Append a category column from an ordered (condition, label) chain.
    First matching rule wins — identical to the reference's if/elif
    routing."""
    expr = None
    for cond, label in rules:
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    expr = expr.otherwise(default) if expr is not None else F.lit(default)
    return df.withColumn(out_col, expr)


def split(
    df: DataFrame,
    rules: list[tuple[Column, str]],
    default: str,
    out_col: str = "category",
) -> dict[str, DataFrame]:
    """Materialize the branches as filtered views of the single pass.

    Category labels are statically known from the rule chain (they are
    the rule labels plus the default), so no Spark action runs here —
    a .distinct().collect() would be a driver-side round trip per call.
    """
    cats = list(dict.fromkeys([label for _, label in rules] + [default]))
    return {c: df.where(F.col(out_col) == c) for c in cats}
