"""Z-order (Morton-curve) data layout for multi-column data skipping.

Parquet scans prune row groups / files with footer min-max statistics,
but a layout sorted on ONE column leaves every other column's per-file
range at full width — predicates on the second column prune nothing.
Interleaving the bits of several columns' normalized values and
range-partitioning + sorting on that Morton key bounds EVERY indexed
column within each file, so selective predicates on any of them skip
most of the data. This is the lakehouse OPTIMIZE ZORDER BY technique
(public Delta/Iceberg docs), built here from Spark primitives only:

- per-column min/max from one tiny aggregate, broadcast back;
- normalization + bit interleave as pure Catalyst bit-ops (whole-stage
  codegen, no UDF);
- ``repartitionByRange`` on the key (range exchange with sampled
  boundaries) + ``sortWithinPartitions`` → each output file owns a
  compact Morton range, i.e. a small hyper-rectangle of the key space.

At 100 TB this is a one-shuffle layout job whose cost is repaid by
every subsequent selective scan; the key computation itself is
map-side and columnar.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "add_zorder_column",
    "write_zordered",
    "zorder_interleave_ref",
    "zorder_key_fixed",
    "zorder_key_fixed_sql",
]


def _nan_nulled(col: str) -> Column:
    """``col`` as double with NaN mapped to NULL — NaN has no position
    on the curve, and it must not reach the min/max bounds either:
    NaN is the LARGEST double under Spark ordering, so one NaN row
    would poison ``__zmax_`` (rng = NaN), collapse every row's cell to
    the same value, and silently destroy the whole column's layout
    contribution (a performance cliff, not a correctness break)."""
    v = F.col(col).cast("double")
    return F.when(~F.isnan(v), v)


def _scaled_cell(col: str, bits: int) -> Column:
    """Normalize ``col`` into an integer cell in [0, 2**bits) using the
    broadcast ``__zmin_/__zmax_`` bounds columns. NULL/NaN values take
    the TOP cell explicitly — they have no position, so they cluster
    in one corner of the curve (one file range absorbs them) instead
    of scattering."""
    mn = F.col(f"__zmin_{col}").cast("double")
    mx = F.col(f"__zmax_{col}").cast("double")
    rng = mx - mn
    v = _nan_nulled(col)
    frac = (v - mn) / rng
    cell = F.floor(frac * F.lit(float(1 << bits))).cast("long")
    top = F.lit((1 << bits) - 1).cast("long")
    # branch order matters: the missing-value and rng==0 guards must
    # fire BEFORE `frac` is evaluated — CaseWhen short-circuits per
    # row, and dividing by rng=0 raises [DIVIDE_BY_ZERO] under ANSI
    return (
        F.when(v.isNull(), top)
        .when(rng == 0, F.lit(0).cast("long"))
        .otherwise(F.least(cell, top))
    )


def add_zorder_column(
    df: DataFrame, cols: list[str], bits: int = 12, out_col: str = "_z"
) -> DataFrame:
    """Append the Morton (Z-order) key over ``cols`` as ``out_col``.

    Column values are min-max normalized to ``bits``-bit cells (bounds
    from one single-row aggregate, broadcast), then bit-interleaved
    lowest-bit-first across columns — all as Catalyst bit arithmetic.
    Numeric/timestamp-castable columns only.
    """
    if not cols:
        raise ValueError("zorder needs at least one column")
    aggs = [
        agg
        for c in cols
        for agg in (
            F.min(_nan_nulled(c)).alias(f"__zmin_{c}"),
            F.max(_nan_nulled(c)).alias(f"__zmax_{c}"),
        )
    ]
    bounds = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(bounds))
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        cell = _scaled_cell(c, bits)
        for b in range(bits):
            bit = F.shiftright(cell, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + ci))
    drop = [f"__zmin_{c}" for c in cols] + [f"__zmax_{c}" for c in cols]
    return joined.withColumn(out_col, z).drop(*drop)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 12,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` laid out along the Z-curve of ``cols``.

    Range exchange on the Morton key (sampled boundaries → balanced
    files) + in-partition sort → every file covers one compact curve
    segment; parquet footer min-max on each of ``cols`` is then tight
    per file and selective predicates on ANY of them skip files.
    """
    zdf = add_zorder_column(df, cols, bits=bits)
    (
        zdf.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )


def zorder_key_fixed(cols: list[str], bits: int = 16) -> Column:
    """Morton key over ALREADY-INTEGER, non-negative columns — no
    min-max normalization (``add_zorder_column`` normalizes; this is
    the oracle-exact variant for columns that are natural grid cells,
    e.g. a key id and a day index). Callers guarantee each value fits
    in ``bits`` bits; larger values alias onto their low bits, which
    only coarsens locality, never breaks determinism. NEGATIVE inputs
    clamp to cell 0 in BOTH variants — without the clamp the two
    engines diverge silently (Spark's shiftright+AND reads two's-
    complement bits while SQL ``% 2`` yields -1 for odd negatives),
    which would surface as an inscrutable oracle mismatch the first
    time a caller's epoch assumption breaks. Pure Catalyst bit
    arithmetic (whole-stage codegen). Mirror in ANSI SQL with
    ``zorder_key_fixed_sql`` so DuckDB computes the identical key.
    """
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        cell = F.greatest(F.col(c).cast("long"), F.lit(0))
        for b in range(bits):
            bit = F.shiftright(cell, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + ci))
    return z


def zorder_key_fixed_sql(cols: list[str], bits: int = 16) -> str:
    """DuckDB twin of ``zorder_key_fixed``: the same interleave as
    portable integer arithmetic (``//`` + ``%`` + ``<<`` + ``|``),
    with the same clamp-negatives-to-0 guard — bit-identical for ANY
    integer input."""
    terms = [
        f"(((greatest(CAST({c} AS BIGINT), 0) // {1 << b}) % 2)"
        f" << {b * len(cols) + ci})"
        for ci, c in enumerate(cols)
        for b in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


def zorder_interleave_ref(cells: list[int], bits: int) -> int:
    """Pure-Python reference for the interleave (tests only)."""
    z = 0
    for ci, cell in enumerate(cells):
        for b in range(bits):
            z |= ((cell >> b) & 1) << (b * len(cells) + ci)
    return z
