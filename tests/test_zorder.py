"""Z-order layout: key correctness vs a Python reference, and the
data-skipping claim checked against real parquet footer statistics —
a rectangle predicate on the SECOND column must prune files under the
Z-layout while a single-column sort layout cannot prune at all."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from biodiversity_data_ingestion_spark.functions.zorder import (
    add_zorder_column,
    write_zordered,
    zorder_interleave_ref,
)


def _grid(spark, side=64):
    # side x side integer grid; both columns uniform over [0, side)
    return spark.range(side * side).select(
        (F.col("id") % side).alias("x"), (F.col("id") / side).cast("long").alias("y")
    )


def test_zorder_key_matches_python_reference(spark):
    bits = 6
    df = _grid(spark, side=64)  # cells == raw values when side == 2**bits
    rows = add_zorder_column(df, ["x", "y"], bits=bits).collect()
    for r in rows:
        # min-max normalization maps v in [0,63] to floor(v/63 * 64),
        # capped at 63 — recompute the same cell for the reference
        cells = [min(int(v / 63 * 64), 63) for v in (r.x, r.y)]
        assert r._z == zorder_interleave_ref(cells, bits)


def _files_matching(path, lo, hi, col):
    """Count files whose footer min/max for ``col`` intersects [lo, hi]."""
    n = 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[col]).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if min(mins) <= hi and max(maxs) >= lo:
            n += 1
    return n


def test_zorder_layout_skips_files_single_sort_cannot(spark, tmp_path):
    df = _grid(spark, side=64)
    zpath, xpath = str(tmp_path / "zorder"), str(tmp_path / "xsort")
    write_zordered(df, zpath, ["x", "y"], n_files=8, bits=6)
    # baseline: same file count, sorted on x only
    df.repartitionByRange(8, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(xpath)

    # selective predicate on y: the x-sorted layout leaves y's per-file
    # range at full width (every file matches); the Z-layout bounds y
    z_hit = _files_matching(zpath, 0, 7, "y")
    x_hit = _files_matching(xpath, 0, 7, "y")
    assert x_hit == 8
    assert z_hit <= x_hit // 2

    # and the data survives the layout intact
    back = spark.read.parquet(zpath)
    assert back.count() == 64 * 64
    assert back.agg(F.sum("x"), F.sum("y")).first() == df.agg(
        F.sum("x"), F.sum("y")
    ).first()


def test_zorder_nan_rows_cannot_poison_the_layout(spark):
    # NaN is the LARGEST double under Spark ordering, so before the
    # _nan_nulled bounds guard a single NaN row poisoned __zmax_
    # (rng = NaN), collapsed EVERY row's cell to the same value, and
    # silently destroyed the whole column's layout contribution.
    # Contract: clean rows' Morton keys are bit-identical with or
    # without planted garbage; NULL/NaN rows take the top cell
    # (clustered in one curve corner); a constant column (rng == 0)
    # must not raise [DIVIDE_BY_ZERO] under ANSI.
    rows = [(i, float(i), float(i % 10)) for i in range(100)]
    clean = spark.createDataFrame(rows, "id LONG, a DOUBLE, b DOUBLE")
    dirty = spark.createDataFrame(
        rows + [(900, float("nan"), 5.0), (901, None, 5.0)],
        "id LONG, a DOUBLE, b DOUBLE",
    )
    zc = {r["id"]: r["_z"] for r in add_zorder_column(clean, ["a", "b"], bits=8).collect()}
    zd = {r["id"]: r["_z"] for r in add_zorder_column(dirty, ["a", "b"], bits=8).collect()}
    assert all(zc[i] == zd[i] for i in range(100))
    assert len(set(zc.values())) == 100  # the layout still discriminates
    assert zd[900] == zd[901]  # missing values cluster deterministically

    const = spark.createDataFrame(
        [(1, 7.0, 2.0), (2, 7.0, 3.0)], "id LONG, a DOUBLE, b DOUBLE"
    )
    got = {r["id"]: r["_z"] for r in add_zorder_column(const, ["a", "b"], bits=4).collect()}
    assert got[1] != got[2]  # the varying column still separates rows
