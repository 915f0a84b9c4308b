"""Every declared query must match its DuckDB oracle EXACTLY at sf0.01 —
the local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from biodiversity_data_ingestion_spark.plans.queries import QUERIES

from .conftest import SF_DIR
from .oracle_harness import compare, duckdb_con


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    spec = QUERIES[name]
    if spec["oracle"] is None:
        df = spec["builder"](spark, SF_DIR)
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    result = compare(name, spec["builder"](spark, SF_DIR), con, spec["oracle"])
    assert result.ok, f"{name}: rows {result.spark_rows}/{result.oracle_rows}; " + "; ".join(
        result.problems[:5]
    )
