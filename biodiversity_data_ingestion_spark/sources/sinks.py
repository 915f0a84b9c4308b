"""Sinks (reference parity).

- S7 single-file JSONL sink (WriteToText num_shards=1,
  data_ingestion/src/dependencies/taxonomy_pipeline.py:124-145)
- S8 per-group file sink (one file per species after GroupByKey,
  utils/helpers.py:31-41, transforms.py:294-336 tmp+rename)
- S9 append/truncate table sink (WriteToBigQuery FILE_LOADS,
  taxonomy_pipeline.py:109-119; my_pipeline.py:151-156)
- S10 search-index sink with last-writer-wins doc ids
  (beam/src/dependencies/utils/write_to_elasticsearch.py:78-94 — ES
  ``_id`` upsert semantics => dedup to one row per id before writing)
- date-versioned output dirs + "current" pointer + N-2 cleanup — the
  reference's index/alias swap (airflow/dags/biodiversity_metadata_dag
  .py:246-329) re-expressed as directory versions.
- S11 driver-side object dumps feeding S1 (airflow/dags/
  biodiversity_metadata_dag.py:46-86, biodiversity_data_dag.py:44-68):
  ingestion-script writes, in-engine simply `write_jsonl` below — the
  snapshot tables they produce are this engine's fixture inputs.

Scale notes: S8's manual tmp-then-rename disappears into Spark's task
commit protocol. partitionBy(key) writes one directory per key — at
100 TB pair it with repartition(key) first so each partition directory
is written by few tasks (avoids the many-small-files explosion).
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import date

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import keep_min_by


def write_jsonl_single(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7: one output shard (the reference's num_shards=1 consolidated
    JSONL). coalesce(1) — only for small edge outputs, never for bulk."""
    df.coalesce(1).write.mode(mode).json(path)


def write_per_group(df: DataFrame, path: str, group_col: str, mode: str = "overwrite") -> None:
    """S8: one directory per group value. repartition on the group key
    first: each group's rows land in one task => one file per group
    (the reference's one-file-per-species contract)."""
    df.repartition(F.col(group_col)).write.mode(mode).partitionBy(group_col).parquet(path)


def append_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """S9 WRITE_APPEND. ``fmt``: any session-available columnar format
    (parquet default; orc is built-in — same pushdown/pruning story,
    see test_orc_roundtrip_and_pushdown; avro needs the external
    spark-avro module, absent in this container)."""
    df.write.mode("append").format(fmt).save(path)


def overwrite_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """S9 WRITE_TRUNCATE (same ``fmt`` contract as append_table)."""
    df.write.mode("overwrite").format(fmt).save(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Catalog-backed bucketed+sorted table: pre-shuffled on the join/agg
    key at WRITE time, so every later equi-join or aggregation on that
    key is exchange-free — the 100 TB pattern for fact tables that join
    repeatedly on the same key (pay the shuffle once, reuse it forever).
    Sorting within buckets additionally lets joins skip the sort phase.
    Reads come back through ``spark.table(name)``.
    """
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(name)
    )


def write_index_table(
    df: DataFrame, path: str, id_col: str, order: list[Column] | None = None
) -> None:
    """S10: ES-style document index as a parquet table. ES bulk upserts
    are last-writer-wins per ``_id``; reproduce deterministically by
    keeping the top row per id under ``order`` (callers pass the arrival
    or version ordering; default keeps max of a monotonic ingest column
    named '_seq' if present, else arbitrary-but-single row per id).

    NULL-id documents have no identity to collide on, so they all
    survive — ES auto-generates a unique ``_id`` for id-less bulk
    index ops. (The window dedup alone would group NULLs together and
    silently collapse N distinct id-less documents to one row.)"""
    if order is None:
        if "_seq" in df.columns:
            order = [F.col("_seq").desc()]
        else:
            order = [F.lit(1).asc()]
    keyed = df.where(F.col(id_col).isNotNull())
    deduped = keep_min_by(keyed, [id_col], order).unionByName(
        df.where(F.col(id_col).isNull())
    )
    deduped.write.mode("overwrite").parquet(path)


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Idempotent partition-scoped backfill: overwrite ONLY the
    partitions present in ``df``, leaving every other partition of the
    table untouched (``spark.sql.sources.partitionOverwriteMode =
    dynamic``; the session default STATIC truncates the whole table
    first — the classic daily-rerun data-loss trap). This is the lake
    contract a 100 TB daily pipeline needs: re-running one day's job
    replaces exactly that day's directory, so retries and late
    backfills are idempotent without table locks or manual deletes.

    The mode is passed as a PER-WRITE DataFrameWriter option, never by
    mutating the session conf: a set/restore around the write would
    race any concurrent writer in the same session (their in-flight
    overwrite would silently turn dynamic), while the option is scoped
    to exactly this write.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .format(fmt)
        .save(path)
    )


# ---------------------------------------------------------------------------
# date-versioned dirs + atomic "current" pointer (index/alias swap)

CURRENT_POINTER = "_CURRENT"


def write_versioned(
    df: DataFrame,
    base_dir: str,
    name: str,
    version: str | None = None,
    keep_versions: int = 2,
) -> str:
    """Write ``{base_dir}/{version}_{name}`` then atomically swap the
    ``_CURRENT`` pointer to it and delete versions older than the newest
    ``keep_versions`` (the reference keeps today + yesterday and deletes
    N-2, biodiversity_metadata_dag.py:304-329)."""
    version = version or date.today().isoformat()
    out = os.path.join(base_dir, f"{version}_{name}")
    df.write.mode("overwrite").parquet(out)

    os.makedirs(base_dir, exist_ok=True)
    pointer = os.path.join(base_dir, CURRENT_POINTER)
    tmp = pointer + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"name": name, "version": version, "path": out}, fh)
    os.replace(tmp, pointer)  # atomic swap == alias flip

    versions = sorted(
        d for d in os.listdir(base_dir)
        if d.endswith(f"_{name}") and os.path.isdir(os.path.join(base_dir, d))
    )
    for stale in versions[:-keep_versions]:
        shutil.rmtree(os.path.join(base_dir, stale))
    return out


def read_current(spark, base_dir: str) -> DataFrame:
    """Resolve the _CURRENT pointer and read the live version."""
    with open(os.path.join(base_dir, CURRENT_POINTER)) as fh:
        return spark.read.parquet(json.load(fh)["path"])


def compact_files(
    spark,
    path: str,
    target_file_mb: int = 128,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction: rewrite ``path`` as ceil(bytes / target)
    files and atomically replace the directory. Returns the new file
    count.

    Streaming sinks and incremental appends accumulate many small files;
    at scale a 128 MB-file layout keeps scan task count ~= data size /
    maxPartitionBytes instead of one task per tiny file (and parquet
    footers stay worth reading). The rewrite is one round-robin exchange
    — no sort, layout-preserving jobs should use write_zordered instead.
    The swap goes through a sibling temp dir + rename, the same
    alias-flip discipline as write_versioned.
    """
    import math

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if not f.startswith(("_", "."))
    )
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(path)
    tmp = path.rstrip("/") + ".__compact_tmp__"
    df.repartition(n_files).write.format(fmt).mode("overwrite").save(tmp)
    old = path.rstrip("/") + ".__compact_old__"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files


def write_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    text_col: str,
    meta_cols: list[str] | None = None,
    samples_per_shard: int = 100,
) -> DataFrame:
    """Export a corpus as WebDataset-style tar shards — the sequential
    training-loader format (each sample = adjacent members
    ``{key}.txt`` + ``{key}.json`` inside ``shard-%06d.tar``).

    Layout: samples get an md5 rank (deterministic shuffle, the same
    derandomized scheme as the epoch shuffler), a global position via
    one rank window, and shard = pos // samples_per_shard — so every
    shard except the last is exactly full and a loader can stripe
    shards across workers. Each shard group writes ITS OWN tar
    (`applyInPandas` per shard): at 100 TB this is the standard
    creation shape — one whole shard per task, sequential tar write,
    no driver involvement; tasks write executor-local and the returned
    manifest carries per-shard byte counts for the upload step. Tar
    bytes are REPRODUCIBLE (members sorted by rank, mtime=0, uid=gid=0,
    no user names), so re-exports of identical data are byte-identical
    — content-addressable shard caching works.

    The global rank window is a single-partition sort of (rank, key)
    pairs only — at extreme corpus sizes swap it for
    ``zipWithIndex``-style per-partition offsets; the tar-writing
    stage is unchanged.

    Returns the manifest DataFrame (shard, n_samples, n_bytes, path).
    """
    import tarfile

    from pyspark.sql import Window

    meta_cols = list(meta_cols or [])
    os.makedirs(out_dir, exist_ok=True)

    # NULL-key samples are quarantined: a member has no name without a
    # key (they would all collide on a literal "None.txt" inside a
    # shard), and concat_ws's NULL-skip would hash them all to the
    # constant md5('wds') — the same NULL-key class fixed in
    # operators/sampling.hash_hex. concat (NULL-propagating) keeps the
    # rank expression aligned with the convention there.
    keyed = df.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("_key"),
        F.col(text_col).cast("string").alias("_text"),
        F.to_json(F.struct(*[F.col(c) for c in meta_cols])).alias("_meta")
        if meta_cols
        else F.lit("{}").alias("_meta"),
    ).withColumn("_rk", F.md5(F.concat(F.lit("wds:"), F.col("_key"))))
    w = Window.orderBy("_rk", "_key")
    sharded = keyed.withColumn(
        "_shard",
        ((F.row_number().over(w) - 1) / F.lit(samples_per_shard)).cast("int"),
    )

    def _write_shard(pdf):
        import pandas as pd

        shard = int(pdf["_shard"].iloc[0])
        path = os.path.join(out_dir, f"shard-{shard:06d}.tar")
        pdf = pdf.sort_values(["_rk", "_key"], ignore_index=True)
        n_bytes = 0
        with tarfile.open(path, "w") as tar:
            for _, row in pdf.iterrows():
                for ext, payload in (
                    ("txt", row["_text"].encode()),
                    ("json", row["_meta"].encode()),
                ):
                    info = tarfile.TarInfo(name=f"{row['_key']}.{ext}")
                    info.size = len(payload)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    import io

                    tar.addfile(info, io.BytesIO(payload))
                    n_bytes += len(payload)
        return pd.DataFrame(
            [
                {
                    "shard": shard,
                    "n_samples": len(pdf),
                    "n_bytes": n_bytes,
                    "path": path,
                }
            ]
        )

    return sharded.groupBy("_shard").applyInPandas(
        _write_shard, "shard int, n_samples long, n_bytes long, path string"
    )
