"""Composed pipelines (reference parity, SURVEY.md §3).

The reference chains six Beam pipelines for occurrence analytics
(data_ingestion/README.md:124-133) and one metadata ETL
(beam/src/dependencies/my_pipeline.py:21-158). Here each chain is a
DataFrame-to-DataFrame composition — stages fuse into one Spark job per
sink, shuffles land exactly where the reference had GroupByKey /
CoGroupByKey, and every external REST dependency is a snapshot-table
join.

Scale: the cleaning chain is filter->filter->filter (codegen, pushed to
scan) -> broadcast theta-join (centroids) -> ONE shuffle (the dedup
window on the composite key) -> map-side-combined summary aggregation.
At 100 TB the only materialized exchange is the dedup; everything else
pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators import cleaning
from ..operators.classify import classify
from ..operators.dedup import keep_min_by


def clean_occurrence_records(
    occ: DataFrame,
    centroids: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    uncertainty: str = "uncertainty_m",
    species: str = "species",
    id_col: str = "occurrence_id",
    unc_lo: float = 1000.0,
    unc_hi: float = 5000.0,
    centroid_dist_m: float = 5000.0,
) -> DataFrame:
    """The cleaning_occs pipeline (cleaning_occs_pipeline.py:12-106):
    P7a zero-coords -> P7b range -> P7c uncertainty bounds -> P9 centroid
    anti-join -> A5 composite-key dedup (min uncertainty, id tie-break).
    The P8 land filter composes via operators.geo.point_in_polygons_filter
    when polygon data is supplied."""
    step = cleaning.drop_zero_coords(occ, lat, lon)
    step = cleaning.drop_out_of_range(step, lat, lon)
    step = cleaning.filter_uncertainty(step, uncertainty, unc_lo, unc_hi)
    step = cleaning.centroid_distance_filter(
        step, centroids, lat, lon, max_dist_m=centroid_dist_m
    )
    return cleaning.dedup_best_coordinate(
        step, [species, lat, lon], uncertainty, [id_col]
    )


def cleaning_pipeline_with_summary(
    occ: DataFrame,
    centroids: DataFrame,
    species: str = "species",
    **kwargs,
) -> tuple[DataFrame, DataFrame]:
    """Cleaning chain + the cleaning_summary pipeline (A2/J5): per-species
    total vs retained counts and percent kept, missing sides -> 0."""
    cleaned = clean_occurrence_records(occ, centroids, species=species, **kwargs)
    summary = cleaning.cleaning_summary(occ, cleaned, species)
    return cleaned, summary


def metadata_etl(
    samples: DataFrame,
    rules: list[tuple[Column, str]],
    default_category: str,
    tax_id: str = "tax_id",
    rank_col: str | None = None,
    rank_order: list[Column] | None = None,
) -> DataFrame:
    """The metadata ETL spine (my_pipeline.py:21-158): P1 classify ->
    per-category dead-letter/routing column -> A6 dedup per record id ->
    J1 taxon-level co-group collapsed to per-taxon aggregate lists.

    Returns one nested row per (tax_id, category) with collected record
    structs — the shape the index tables project from."""
    routed = classify(samples, rules, default_category)
    if rank_col is not None and rank_order is not None:
        routed = keep_min_by(routed, [tax_id], rank_order)
    payload = F.struct(*[c for c in routed.columns if c != tax_id])
    return (
        routed.groupBy(tax_id, "category")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.collect_list(payload).alias("records"),
        )
    )


def materialize_tokenized_corpus(docs: DataFrame, path: str) -> DataFrame:
    """Tokenize-once materialization for the text-analysis family.

    doc_dupline_ratio, doc_unigram_logprob, vocab_token_ids and
    term_pair_pmi each tokenize `documents` independently — correct, and
    cheap at test scale, but at 100 TB tokenization is the dominant scan
    cost and should be paid ONCE. This stage writes
    ``(doc_id, lang, source, toks array<string>, n_toks)`` as parquet;
    downstream consumers explode/aggregate from the materialized arrays
    (nested-column pruning keeps untouched fields unread).

    Returns the re-read DataFrame so callers compose off the
    materialized table, not the in-memory plan.
    """
    from ..functions.textfn import tokenize

    prepped = docs.select(
        "doc_id",
        "lang",
        "source",
        tokenize(F.lower(F.trim(F.col("text")))).alias("toks"),
    ).withColumn("n_toks", F.size("toks").cast("long"))
    prepped.write.mode("overwrite").parquet(path)
    return docs.sparkSession.read.parquet(path)


def clean_with_observed_metrics(
    occ: DataFrame,
    centroids: DataFrame,
    **kwargs,
):
    """Cleaning chain instrumented with ``Observation`` metrics: row
    counts and null/filter tallies accumulate DURING the one cleaning
    pass instead of re-scanning per metric (each `count()`-style audit
    on a 100 TB input is another full scan; observations are free —
    they ride the existing job as accumulators).

    Returns (cleaned_df, observations) where observations maps stage ->
    Observation; call ``obs.get`` AFTER an action on cleaned_df to read
    {rows_in, null_coords, rows_out}. The reference's cleaning summary
    (A2) is a *separate* counting pipeline; this is the in-flight
    equivalent for pipeline health gates (alert if retained % collapses)
    without a second pass.
    """
    from pyspark.sql import Observation

    obs_in = Observation("cleaning_in")
    obs_out = Observation("cleaning_out")
    lat = kwargs.get("lat", "lat")
    lon = kwargs.get("lon", "lon")
    observed_in = occ.observe(
        obs_in,
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(
            (F.col(lat).isNull() | F.col(lon).isNull()).cast("long")
        ).alias("null_coords"),
    )
    cleaned = clean_occurrence_records(observed_in, centroids, **kwargs)
    cleaned = cleaned.observe(obs_out, F.count(F.lit(1)).alias("rows_out"))
    return cleaned, {"in": obs_in, "out": obs_out}
