"""Regression net for the signed-zero oracle class (round 10).

The failure mode that kept `dsir_importance_weights` red for three
rounds: `round()` of a tiny negative DOUBLE collapses to `0.0` in
Spark (HALF_UP BigDecimal round drops the sign) but `-0.0` in DuckDB
(IEEE multiply-and-round keeps it). IEEE `==` cannot see the
difference; the driver's value hash can. The registry-wide fix is the
`_pz` / `_pz_sql` normalization pair on every signable rounded final
(plans/queries.py).

This test closes the loop for FUTURE queries: it evaluates every
registered oracle in DuckDB at sf0.01 (no Spark session needed — the
cheap side) and asserts no scalar float column carries a negative
zero. A failure here means a new query's final column needs the
`_pz`/`_pz_sql` treatment — or, if Spark's twin provably emits the
same `-0.0` (a non-`round()` path), an explicit allowlist entry below
with a comment. Limitation: list/struct columns are not descended
into; the bitwise `_eq` in oracle_harness covers those at parity
time.
"""

from __future__ import annotations

import numpy as np
import pytest

from biodiversity_data_ingestion_spark.plans.queries import QUERIES

from .conftest import SF_DIR
from .oracle_harness import duckdb_con

# queries whose -0.0 is verified to appear identically in the Spark
# result (bitwise parity green), so normalization is not required
ALLOWED_NEGATIVE_ZERO: set[str] = {
    # clim_bio2 (-0.0 in 746/1500 rows) and clim_bio3: the Spark side
    # rounds inside the numpy mapInPandas raster kernel
    # (operators/geo.py), which is IEEE sign-preserving EXACTLY like
    # DuckDB's round — both engines emit the same -0.0 bit, and the
    # bitwise parity sweep is green (r10). The hazard only exists for
    # F.round (JVM BigDecimal HALF_UP, sign-dropping) vs DuckDB round.
    "climate_zonal_grid",
}


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize(
    "name", sorted(n for n, s in QUERIES.items() if s["oracle"] is not None)
)
def test_oracle_emits_no_negative_zero(con, name):
    if name in ALLOWED_NEGATIVE_ZERO:
        pytest.skip("verified matched -0.0 (see allowlist comment)")
    df = con.execute(QUERIES[name]["oracle"]).df()
    offenders = []
    for c in df.columns:
        if df[c].dtype.kind != "f":
            continue
        vals = df[c].to_numpy()
        mask = (vals == 0) & np.signbit(vals) & ~np.isnan(vals)
        if mask.any():
            offenders.append((c, int(mask.sum())))
    assert not offenders, (
        f"{name}: oracle emits -0.0 in {offenders} — wrap the final "
        "column with _pz (Spark) + _pz_sql/CASE (oracle), or allowlist "
        "with evidence that Spark emits the identical bit"
    )


def test_eq_comparator_descends_into_lists_and_arrays():
    """The bitwise `_eq` must reach nested floats inside list cells.

    r10 ADVICE: `pd.isna(list)` returns an ARRAY whose truth value
    raises ValueError, so the list branch had to move ABOVE the NA
    check — otherwise any multi-element list cell crashed the harness
    instead of being compared element-wise. This pins the fix and the
    bitwise semantics for nested values.
    """
    from .oracle_harness import _eq

    # multi-element lists no longer crash and compare element-wise
    assert _eq([1.0, 2.0], [1.0, 2.0])
    assert not _eq([1.0, 2.0], [1.0, 3.0])
    assert not _eq([1.0], [1.0, 2.0])
    # bitwise inside the list: -0.0 != 0.0, NaN == NaN
    assert not _eq([0.0], [-0.0])
    assert _eq([float("nan")], [float("nan")])
    # ndarray cells (Spark toPandas yields ndarrays for array<T>)
    assert _eq(np.array([1.0, 2.0]), [1.0, 2.0])
    assert not _eq(np.array([0.0, 1.0]), np.array([-0.0, 1.0]))
    # nested lists recurse
    assert _eq([[1.0, -0.0]], [[1.0, -0.0]])
    assert not _eq([[1.0, 0.0]], [[1.0, -0.0]])
    # sequence vs scalar is a mismatch, not a crash
    assert not _eq([1.0], None)
    assert not _eq([1, 2], 3)
    # ... including a 1-element float array vs a bare scalar: the
    # sequence branch must run BEFORE the float branch, or
    # float(np.array([0.5])) silently certifies the shape mismatch
    assert not _eq(np.array([0.5]), 0.5)
    assert not _eq(0.5, np.array([0.5]))
    assert not _eq([0.5], 0.5)
    # ... and a 0-d ndarray vs a sequence must be a mismatch, not a
    # harness crash — while a 0-d ndarray IS its scalar value
    assert not _eq(np.array(1.0), [1.0])
    assert _eq(np.array(1.0), np.array(1.0))
    assert _eq(np.array(1.0), 1.0)
    assert not _eq(np.array(0.0), np.array(-0.0))
    # strings/dicts/other iterables are NOT sequences: list('x') must
    # not coerce a shape mismatch green
    assert not _eq(["x"], "x")
    assert not _eq(["a", "b"], "ab")
    assert not _eq([1, 2], {1: "u", 2: "v"})
    assert _eq("ab", "ab")
    # scalar NA semantics unchanged
    assert _eq(None, None)
    assert not _eq(None, 0.0)
