"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a declared Spark query and its oracle SQL side-by-side on the same
parquet tables, canonicalizes both results (columns sorted by name, rows
sorted by all values) and compares row count, column names and values —
so every mismatch the driver would record is caught here first.
"""

from __future__ import annotations

import math
import os
import struct
from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con_raw() -> duckdb.DuckDBPyConnection:
    """A bare connection with the engine-parity pins but NO table views
    — for planted-fixture tests that register their own views. Pins
    pre-1.1 division semantics (x/0.0 -> NULL): DuckDB >= 1.1 defaults
    ieee_floating_point_ops=true, where x/0.0 -> inf, inverting both
    the zero-norm cosine nulls-last parity and the zero-denominator
    quarantine contracts."""
    con = duckdb.connect()
    try:
        con.execute("SET ieee_floating_point_ops = false")
    except duckdb.Error:
        pass
    return con


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Zero-norm cosine parity (operators/similarity.py::cosine) relies
    # on DuckDB's x/0.0 -> NULL. DuckDB >= 1.1 flips the default to
    # IEEE semantics (x/0.0 -> inf, which would rank FIRST under
    # ORDER BY cos DESC and silently invert the nulls-last parity), so
    # pin the pre-1.1 behavior whenever the setting exists. On 1.0
    # (this container) the SET is unknown and the default already
    # matches — swallow the error.
    try:
        con.execute("SET ieee_floating_point_ops = false")
    except duckdb.Error:
        pass
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            dt = df[c].dt
            df[c] = dt.tz_localize(None) if getattr(dt, "tz", None) is not None else df[c]
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")
    return df


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    problems: list[str] = field(default_factory=list)


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> CompareResult:
    sp = spark_df.toPandas()
    oc = con.execute(sql).df()
    res = CompareResult(name, True, len(sp), len(oc))

    if sorted(sp.columns) != sorted(oc.columns):
        res.ok = False
        res.problems.append(f"columns differ: spark={sorted(sp.columns)} oracle={sorted(oc.columns)}")
        return res
    if len(sp) != len(oc):
        res.ok = False
        res.problems.append(f"row count differs: spark={len(sp)} oracle={len(oc)}")
        return res

    sp, oc = _canon(sp), _canon(oc)
    for c in sp.columns:
        # The driver hashes raw values, so int64 3 vs float64 3.0 is a
        # mismatch even though float coercion below would equate them
        # (round-2 lesson: uncast DuckDB HUGEINT sums slipped through).
        sk, ok_ = sp[c].dtype.kind, oc[c].dtype.kind
        int_kinds = ("i", "u")
        if (sk in int_kinds) != (ok_ in int_kinds) and {sk, ok_} <= {"i", "u", "f"}:
            res.ok = False
            res.problems.append(
                f"col {c} dtype kind differs: spark={sp[c].dtype} oracle={oc[c].dtype}"
            )
            return res
    for c in sp.columns:
        sv, ov = sp[c].tolist(), oc[c].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if _eq(a, b):
                continue
            res.ok = False
            res.problems.append(f"col {c} row {i}: spark={a!r} oracle={b!r}")
            if len(res.problems) > 5:
                return res
    return res


def _eq(a, b) -> bool:
    if a is None and b is None:
        return True
    # 0-d ndarrays ARE scalars: unwrap before any shape logic so two
    # equal 0-d arrays don't read as a mismatch
    if isinstance(a, np.ndarray) and a.ndim == 0:
        return _eq(a.item(), b)
    if isinstance(b, np.ndarray) and b.ndim == 0:
        return _eq(a, b.item())
    # Sequence branch FIRST: before the float branch, because
    # float(np.array([0.5])) silently succeeds and would certify a
    # sequence-vs-scalar shape mismatch green; and before pd.isna,
    # because isna on a multi-element list/ndarray returns an array
    # whose truth value raises ValueError (r10 ADVICE). np.ndarray
    # included — Spark's toPandas yields ndarrays for array<T> columns.
    # BOTH sides must be sequences: list('x') would coerce a string
    # (or any iterable) and certify a sequence-vs-scalar shape
    # mismatch green — strings, dicts, generators are NOT sequences
    # here.
    a_seq = isinstance(a, (list, tuple, np.ndarray))
    b_seq = isinstance(b, (list, tuple, np.ndarray))
    if a_seq or b_seq:
        if not (a_seq and b_seq):
            return False
        a, b = list(a), list(b)
        # element-wise so nested floats get the same bitwise treatment
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        # BITWISE equality, not `==`: the driver hashes serialized
        # values, so `-0.0` vs `0.0` (identical under IEEE `==`) is a
        # driver mismatch — exactly the bit that kept
        # dsir_importance_weights red for three rounds while the local
        # preflight certified it green (round-9 verdict).
        return struct.pack("<d", af) == struct.pack("<d", bf)
    if pd.isna(a) and pd.isna(b):
        return True
    return a == b
