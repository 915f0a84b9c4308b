"""The SQL view layer (reference parity, SURVEY §3.3).

The reference's declarative query surface is five BigQuery views created
after each daily build (airflow/dags/biodiversity_metadata_dag.py:
330-575). Here the analogous views are registered as Spark temp views
over the engine's tables so downstream consumers run plain Spark SQL —
the same statements the oracle harness checks one by one:

| reference view            | engine view             | declared query          |
|---------------------------|-------------------------|-------------------------|
| sampling_map_base/agg     | v_geotag_aggregation    | geotag_aggregation      |
| metadata_aggregated       | v_dimension_aggregates  | order_priority_dims     |
| (cross_filter CTE)        | v_grouping_sets         | order_dims_grouping_sets|
| rawdata_aggregated (time) | v_monthly_rollup        | orders_monthly          |
| table_data                | v_table_data            | table_data_distinct     |
| ES summary index (A14)    | v_terms_summary         | terms_summary_topk      |
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..sources.tables import register_views
from .queries import QUERIES

_VIEW_MAP = {
    "v_geotag_aggregation": "geotag_aggregation",
    "v_dimension_aggregates": "order_priority_dims",
    "v_grouping_sets": "order_dims_grouping_sets",
    "v_monthly_rollup": "orders_monthly",
    "v_table_data": "table_data_distinct",
    "v_terms_summary": "terms_summary_topk",
}


def register_all_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register base tables + the serving views; returns view names."""
    register_views(spark, sf_dir)
    for view, query in _VIEW_MAP.items():
        QUERIES[query]["builder"](spark, sf_dir).createOrReplaceTempView(view)
    return list(_VIEW_MAP)
