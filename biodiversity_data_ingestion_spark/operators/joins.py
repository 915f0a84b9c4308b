"""Join patterns (reference parity).

- J1 multi-way co-group -> collect_list aggregates + full outer join
  (beam/src/dependencies/my_pipeline.py:96-100)
- J2 incremental gate anti-join (taxonomy_pipeline.py:39-62,
  helpers.py:237-271 — documented set difference)
- J3/J4 full-outer struct merge (spatial_annotation_pipeline.py:62-69,
  98-104)
- J6 broadcast dict lookups -> broadcast() left joins
  (my_pipeline.py:113-133)

Scale: gate anti-joins broadcast the seen-key set when small (the usual
case — it's keys only); co-group aggregates rely on map-side partial
collect_list. Skewed keys are handled by AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gate_anti_join(new: DataFrame, seen: DataFrame, key: str) -> DataFrame:
    """J2: emit only rows whose key has never been seen. The gate side is
    projected to its key column first so Catalyst can broadcast it."""
    return new.join(
        F.broadcast(seen.select(key).where(F.col(key).isNotNull()).distinct()),
        key,
        "left_anti",
    )


def cogroup_collect(
    sides: dict[str, DataFrame], key: str, value_col: dict[str, str]
) -> DataFrame:
    """J1: one output row per key with a sorted list column per side
    (CoGroupByKey semantics: sides may be empty -> empty array)."""
    out = None
    for name, df in sides.items():
        agg = df.groupBy(key).agg(
            F.array_sort(F.collect_list(value_col[name])).alias(f"{name}_list")
        )
        out = agg if out is None else out.join(agg, key, "full_outer")
    for name in sides:
        out = out.withColumn(
            f"{name}_list", F.coalesce(F.col(f"{name}_list"), F.array())
        )
    return out


def full_outer_merge(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """J3/J4: full outer join keeping either side when the other is
    absent — the reference's dict-merge with empty-dict defaults."""
    return left.join(right, key, "full_outer")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    tie_col: str,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: attach to each left row the LATEST right row
    of the same key with ``right_ts <= left_ts`` (ties on the timestamp
    broken by max ``tie_col``); left rows with no match keep nulls.

    Engine extension (no as-of operator exists in the reference). The
    naive formulation is an inequality join — a nested-loop at scale.
    Instead both sides are tagged and unioned, and one
    ``last(payload, ignoreNulls)`` runs over a key-partitioned window
    ordered by (ts, side, tie): a single shuffle on the key, linear in
    input, with right rows sorted before left rows at equal timestamps
    so the boundary is inclusive.
    """
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(None).cast(right.schema[tie_col].dataType).alias("_tie"),
        F.struct(*left.columns).alias("_l"),
        F.lit(1).alias("_side"),
    )
    # NULL-key / NULL-ts right rows can never satisfy the as-of
    # predicate (key = key AND right_ts <= left_ts is NULL on either),
    # but Spark's NULLS-FIRST ascending sort would place them at the
    # head of the window where last(ignoreNulls) happily matches them
    # to every left row — silently diverging from the SQL formulation.
    # Quarantine them here; left rows always pass through (no match ->
    # NULL payload, the LEFT-join contract).
    r = right.where(F.col(key).isNotNull() & F.col(right_ts).isNotNull()).select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.col(tie_col).alias("_tie"),
        F.struct(*right.columns).alias("_r"),
        F.lit(0).alias("_side"),
    )
    l = l.withColumn("_r", F.lit(None).cast(r.schema["_r"].dataType))
    r = r.withColumn("_l", F.lit(None).cast(l.schema["_l"].dataType))
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    return matched.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right.columns],
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    before_seconds: int,
    after_seconds: int = 0,
    bin_seconds: int | None = None,
) -> DataFrame:
    """Inner range join: all (left, right) pairs with equal ``key`` and
    ``right_ts`` within ``[left_ts - before, left_ts + after]``. Right
    columns come back prefixed ``r_``.

    Engine extension. A raw interval predicate would plan as a
    broadcast-nested-loop join (O(n*m) comparisons). Here each left row
    is exploded to the few coarse time buckets its window overlaps and
    each right row to its own bucket, so Catalyst plans an equi-join on
    (key, bucket) — shuffle-hash/SMJ, AQE-skew-splittable — and the
    exact interval predicate only filters within candidate buckets.
    Fan-out per left row is ceil(window/bin)+1 (default bin = window
    width, i.e. at most 2 candidate buckets).
    """
    bin_seconds = bin_seconds or max(before_seconds + after_seconds, 1)
    lsec = F.col(left_ts).cast("long")
    l = left.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor((lsec - before_seconds) / bin_seconds),
                F.floor((lsec + after_seconds) / bin_seconds),
            )
        ),
    )
    r = right.select(
        F.col(key).alias("_rk"),
        F.floor(F.col(right_ts).cast("long") / bin_seconds).alias("_rb"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
    )
    cond = (
        (l[key] == r["_rk"])
        & (l["_b"] == r["_rb"])
        & (F.col(f"r_{right_ts}") >= F.col(left_ts) - F.expr(f"INTERVAL {before_seconds} SECOND"))
        & (F.col(f"r_{right_ts}") <= F.col(left_ts) + F.expr(f"INTERVAL {after_seconds} SECOND"))
    )
    return l.join(r, cond, "inner").drop("_b", "_rk", "_rb")


def upsert_merge(
    base: DataFrame, updates: DataFrame, key: str, delete_col: str | None = None
) -> DataFrame:
    """MERGE-style upsert: updates win on key collision, unmatched base
    rows survive, unmatched updates insert; rows flagged in `delete_col`
    (a boolean on the updates side) are removed.

    The incremental-maintenance upgrade of the reference's
    truncate-and-rewrite metadata sink (SURVEY §2.1 S9) and
    date-versioned swap (S11): instead of rebuilding the table, apply a
    (small) change set. Shape: ONE full-outer join on the key, then
    per-column coalesce(update, base) — at scale the join shuffles both
    sides once on the key; if the base table is bucketed on the key
    (sinks.write_bucketed_table) the base side's exchange disappears.
    Paired with mode("overwrite") it is an atomic batch MERGE INTO.
    """
    cols = [c for c in base.columns if c != key]
    u = updates
    if delete_col is not None:
        u = u.withColumn(delete_col, F.coalesce(F.col(delete_col), F.lit(False)))
    b = base.select(F.col(key), *[F.col(c).alias(f"_b_{c}") for c in cols])
    u = u.select(
        F.col(key),
        F.lit(True).alias("_has_u"),
        *([F.col(delete_col).alias("_del")] if delete_col else []),
        *[F.col(c).alias(f"_u_{c}") for c in cols],
    )
    merged = b.join(u, key, "full_outer")
    if delete_col is not None:
        merged = merged.where(~F.coalesce(F.col("_del"), F.lit(False)))
    return merged.select(
        key,
        *[
            F.when(F.col("_has_u").isNotNull(), F.col(f"_u_{c}"))
            .otherwise(F.col(f"_b_{c}"))
            .alias(c)
            for c in cols
        ],
    )


def bloom_prefilter_semi_join(
    big: DataFrame,
    keys: DataFrame,
    on: str,
    width: int = 4096,
    n_hashes: int = 3,
) -> DataFrame:
    """Semi-join with an explicit BLOOM PREFILTER: the filter side's
    keys are hashed into ``n_hashes`` cells of a ``width``-cell bloom
    (md5 slices — the portable scheme from functions/hashing), the
    distinct-cell set (<= width rows, CONSTANT size regardless of key
    cardinality) broadcasts, and a big-side row survives the prefilter
    only if ALL its cells are present. The exact semi join then runs on
    the (usually tiny) surviving fraction, so the RESULT is exactly
    ``big.join(keys, on, "left_semi")`` — false positives are removed
    by the final join, false negatives are impossible.

    When to reach for it at 100 TB: the keys side is too large to
    broadcast raw (say 500M ids = 4 GB) but its bloom is a few KB —
    the same gap Spark's runtime row-group bloom filters exploit,
    available here as an explicit operator for when the optimizer's
    size thresholds don't fire (e.g. keys produced mid-query). The
    shuffle saved is the big side's non-matching mass, which for
    selective gates is nearly all of it.
    """

    def cell(col, j: int):
        # each hash is a SEEDED md5 (seed prefix j), not a slice of one
        # digest — slicing caps n_hashes at 4 (32 hex chars / 8) and
        # silently yields NULL cells (-> empty result) beyond that
        hx = F.substring(
            F.md5(F.concat(F.lit(f"{j}:"), col.cast("string"))), 1, 8
        )
        return (F.conv(hx, 16, 10).cast("long") % width).cast("int")

    pre = big
    for j in range(n_hashes):
        cells_j = (
            keys.select(cell(F.col(on), j).alias(f"_bloom_{j}")).distinct()
        )
        pre = pre.join(
            F.broadcast(cells_j),
            cell(F.col(on), j) == F.col(f"_bloom_{j}"),
            "left_semi",
        )
    return pre.join(keys.select(on).distinct(), on, "left_semi")
