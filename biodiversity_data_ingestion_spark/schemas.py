"""Declared nested schemas + JSON-schema -> StructType loader (Phase 0).

The reference's sink schemas are BigQuery JSON field lists: each field
has name / type / mode, where mode REQUIRED|NULLABLE|REPEATED encodes
nullability and arrays, and RECORD fields nest recursively — the
metadata table is the deep case (array-of-struct organisms with
repeated characteristics records, a phylogenetic_tree RECORD of seven
rank RECORDs: beam/src/dependencies/utils/schemas.py:1-1139). The Beam
side converts that JSON list to a TableSchema recursively
(data_ingestion/src/dependencies/utils/helpers.py:69-87).

Spark-first equivalents:
- ``struct_type_from_bq_fields`` — the recursive loader, BQ JSON field
  list -> ``StructType``. REQUIRED -> nullable=False, NULLABLE ->
  nullable=True, REPEATED -> ``ArrayType`` (elements non-null, matching
  BQ REPEATED semantics), RECORD -> nested ``StructType``.
- ``METADATA_FIELDS`` / ``METADATA_SCHEMA`` — the metadata-table shape
  declared as the same JSON-style list the reference uses, so the
  declaration doubles as a loader fixture. This mirrors the *shape*
  (depth, modes, repeated records), not all 1,139 lines of leaf fields.

Parquet preserves the nesting natively; nested-schema pruning
(session.py) keeps scans of these tables columnar per leaf.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_BQ_TO_SPARK: dict[str, DataType] = {
    "STRING": StringType(),
    "INTEGER": LongType(),
    "INT64": LongType(),
    "FLOAT": DoubleType(),
    "FLOAT64": DoubleType(),
    "BOOLEAN": BooleanType(),
    "BOOL": BooleanType(),
    "TIMESTAMP": TimestampType(),
    "DATE": DateType(),
    "BYTES": BinaryType(),
}


def struct_type_from_bq_fields(fields: list[dict]) -> StructType:
    """Recursively convert a BigQuery-style JSON field list to a
    ``StructType`` (the Spark analogue of the reference's
    convert_dict_to_table_schema, helpers.py:69-87)."""

    def _field(f: dict) -> StructField:
        mode = f.get("mode", "NULLABLE").upper()
        ftype = f["type"].upper()
        if ftype == "RECORD":
            base: DataType = struct_type_from_bq_fields(f.get("fields", []))
        else:
            try:
                base = _BQ_TO_SPARK[ftype]
            except KeyError:
                raise ValueError(f"unsupported BigQuery type: {f['type']!r}") from None
        if mode == "REPEATED":
            # BQ REPEATED: the array itself is never NULL (defaults to
            # empty) and elements are non-null
            return StructField(f["name"], ArrayType(base, containsNull=False), nullable=False)
        return StructField(f["name"], base, nullable=(mode != "REQUIRED"))

    return StructType([_field(f) for f in fields])


def _rank_record(name: str) -> dict:
    # phylogenetic_tree ranks: REQUIRED RECORD of two NULLABLE strings
    # (schemas.py:122-247)
    return {
        "name": name,
        "type": "RECORD",
        "mode": "REQUIRED",
        "fields": [
            {"name": "scientific_name", "type": "STRING", "mode": "NULLABLE"},
            {"name": "common_name", "type": "STRING", "mode": "NULLABLE"},
        ],
    }


# The metadata-table shape (beam/src/dependencies/utils/schemas.py:1-1139):
# top-level scalars, a REQUIRED RECORD-of-RECORDs tree, and REPEATED
# RECORD columns whose elements themselves carry REPEATED RECORDs
# (organisms[].characteristics[] — the 3-deep path the views explode).
METADATA_FIELDS: list[dict] = [
    {"name": "tax_id", "type": "INTEGER", "mode": "REQUIRED"},
    {"name": "scientific_name", "type": "STRING", "mode": "REQUIRED"},
    {"name": "common_name", "type": "STRING", "mode": "NULLABLE"},
    {"name": "current_status", "type": "STRING", "mode": "REQUIRED"},
    {
        "name": "phylogenetic_tree",
        "type": "RECORD",
        "mode": "REQUIRED",
        "fields": [
            _rank_record(r)
            for r in ("kingdom", "phylum", "class", "order", "family", "genus", "species")
        ],
    },
    {
        "name": "organisms",
        "type": "RECORD",
        "mode": "REPEATED",
        "fields": [
            {"name": "biosample_id", "type": "STRING", "mode": "REQUIRED"},
            {"name": "organism", "type": "STRING", "mode": "NULLABLE"},
            {"name": "sex", "type": "STRING", "mode": "NULLABLE"},
            {"name": "organism_part", "type": "STRING", "mode": "NULLABLE"},
            # lat/lon are STRINGS in the reference sink (schemas.py:53-62)
            {"name": "latitude", "type": "STRING", "mode": "NULLABLE"},
            {"name": "longitude", "type": "STRING", "mode": "NULLABLE"},
            {"name": "habitat", "type": "STRING", "mode": "NULLABLE"},
            {
                # the flattened characteristics long-form
                # (samples_schema.py:6-15)
                "name": "characteristics",
                "type": "RECORD",
                "mode": "REPEATED",
                "fields": [
                    {"name": "field_name", "type": "STRING", "mode": "REQUIRED"},
                    {"name": "field_value", "type": "STRING", "mode": "NULLABLE"},
                    {"name": "unit", "type": "STRING", "mode": "NULLABLE"},
                    {"name": "ontology_term", "type": "STRING", "mode": "NULLABLE"},
                ],
            },
        ],
    },
    {
        "name": "raw_data",
        "type": "RECORD",
        "mode": "REPEATED",
        "fields": [
            {"name": "accession", "type": "STRING", "mode": "REQUIRED"},
            {"name": "instrument_platform", "type": "STRING", "mode": "NULLABLE"},
            {"name": "instrument_model", "type": "STRING", "mode": "NULLABLE"},
            {"name": "first_public", "type": "STRING", "mode": "NULLABLE"},
            {"name": "library_construction_protocol", "type": "STRING", "mode": "NULLABLE"},
        ],
    },
    {
        "name": "assemblies",
        "type": "RECORD",
        "mode": "REPEATED",
        "fields": [
            {"name": "accession", "type": "STRING", "mode": "REQUIRED"},
            {"name": "assembly_name", "type": "STRING", "mode": "NULLABLE"},
            {"name": "description", "type": "STRING", "mode": "NULLABLE"},
        ],
    },
    # REPEATED scalar (schemas.py:1133-1137)
    {"name": "project_name", "type": "STRING", "mode": "REPEATED"},
]

METADATA_SCHEMA: StructType = struct_type_from_bq_fields(METADATA_FIELDS)

# The gate/log table (taxonomy_pipeline.py:90-102): flat, but mixes
# REQUIRED/NULLABLE and a TIMESTAMP — the incremental anti-join key table.
GATE_FIELDS: list[dict] = [
    {"name": "tax_id", "type": "INTEGER", "mode": "REQUIRED"},
    {"name": "scientific_name", "type": "STRING", "mode": "NULLABLE"},
    {"name": "status", "type": "STRING", "mode": "REQUIRED"},
    {"name": "date_seen", "type": "TIMESTAMP", "mode": "REQUIRED"},
]

GATE_SCHEMA: StructType = struct_type_from_bq_fields(GATE_FIELDS)
