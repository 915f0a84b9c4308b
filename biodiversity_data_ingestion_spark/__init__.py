"""PySpark-native analytics engine with the query/data-processing
capabilities of TreeOfLifeDCC/biodiversity-data-ingestion.

Everything here is built Spark-first: the DataFrame / Spark SQL API
declares the logical plan and Catalyst + AQE pick the physical strategy.
Python kernels (geometry, rasters) are isolated behind Arrow-batched
pandas UDF interfaces; everything else is native Catalyst expressions.

Layout
------
- ``session``    — SparkSession factory tuned for large-scale batch.
- ``sources``    — scans: parquet star-schema loader, JSONL w/ filename
                   capture, snapshot tables (the reference's REST feeds).
- ``operators``  — the operator inventory from SURVEY.md §2: cleaning
                   filters, dedup (window / exact / MinHash-LSH / SimHash
                   / n-gram Jaccard), classification splits, gate
                   anti-joins, grouped aggregation patterns, similarity
                   search, text analysis.
- ``functions``  — scalar helpers (portable hashing, haversine, text).
- ``plans``      — the SQL view layer (the reference's BigQuery views).
- ``streaming``  — Structured Streaming extensions over the events table.
"""

__version__ = "0.1.0"
