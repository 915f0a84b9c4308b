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


# ---------------------------------------------------------------------------
# FULL metadata-table mirror (every field of reference
# beam/src/dependencies/utils/schemas.py:1-1139, 221 leaves). The
# reference spells it as one verbose JSON literal; here the same shape
# is DERIVED — the ENA read-run record (49 STRING columns) appears
# three times (raw_data / symbionts_raw_data / metagenomes_raw_data),
# the assembly record three times, the 5-field sample record twice, so
# declaring each once and instantiating by name is both shorter and
# harder to drift.

def _str_fields(names: tuple[str, ...], required: tuple[str, ...] = ()) -> list[dict]:
    return [
        {
            "name": n,
            "type": "STRING",
            "mode": "REQUIRED" if n in required else "NULLABLE",
        }
        for n in names
    ]


def _repeated_record(name: str, fields: list[dict]) -> dict:
    return {"name": name, "type": "RECORD", "mode": "REPEATED", "fields": fields}


# the ENA read-run report columns (reference schemas.py raw_data RECORD;
# all NULLABLE STRING — ENA serves every column as text)
_ENA_READ_RUN_COLS: tuple[str, ...] = (
    "study_accession", "secondary_study_accession", "sample_accession",
    "secondary_sample_accession", "experiment_accession", "run_accession",
    "submission_accession", "tax_id", "scientific_name",
    "instrument_platform", "instrument_model", "library_name",
    "nominal_length", "library_layout", "library_strategy",
    "library_source", "library_selection", "read_count", "base_count",
    "center_name", "first_public", "last_updated", "experiment_title",
    "study_title", "study_alias", "experiment_alias", "run_alias",
    "fastq_bytes", "fastq_md5", "fastq_ftp", "fastq_aspera",
    "fastq_galaxy", "submitted_bytes", "submitted_md5", "submitted_ftp",
    "submitted_aspera", "submitted_galaxy", "submitted_format",
    "sra_bytes", "sra_md5", "sra_ftp", "sra_aspera", "sra_galaxy",
    "sample_alias", "broker_name", "sample_title", "nominal_sdev",
    "first_created", "library_construction_protocol",
)

_ASSEMBLY_COLS: tuple[str, ...] = ("accession", "description")

# biosample summary record: organisms carry the full 10-column form
# (REQUIRED biosample_id), specimens the 7-column, symbionts/metagenomes
# the 5-column prefix — same column family, three widths
_SAMPLE_COLS_10: tuple[str, ...] = (
    "biosample_id", "organism", "common_name", "sex", "organism_part",
    "latitude", "longitude", "project_name", "lifestage", "habitat",
)
_SAMPLE_COLS_7 = _SAMPLE_COLS_10[:7]
_SAMPLE_COLS_5 = _SAMPLE_COLS_10[:5]

_RANKS: tuple[str, ...] = (
    "kingdom", "phylum", "class", "order", "family", "genus", "species",
)

FULL_METADATA_FIELDS: list[dict] = [
    {"name": "tax_id", "type": "INTEGER", "mode": "REQUIRED"},
    {"name": "scientific_name", "type": "STRING", "mode": "REQUIRED"},
    {"name": "common_name", "type": "STRING", "mode": "NULLABLE"},
    {"name": "current_status", "type": "STRING", "mode": "REQUIRED"},
    _repeated_record("organisms", _str_fields(_SAMPLE_COLS_10, required=("biosample_id",))),
    _repeated_record("specimens", _str_fields(_SAMPLE_COLS_7)),
    {
        "name": "phylogenetic_tree",
        "type": "RECORD",
        "mode": "REQUIRED",
        "fields": [_rank_record(r) for r in _RANKS],
    },
    {"name": "phylogenetic_tree_scientific_names", "type": "STRING", "mode": "REPEATED"},
    {"name": "phylogenetic_tree_common_names", "type": "STRING", "mode": "REPEATED"},
    _repeated_record("symbionts", _str_fields(_SAMPLE_COLS_5)),
    _repeated_record("metagenomes", _str_fields(_SAMPLE_COLS_5)),
    _repeated_record("raw_data", _str_fields(_ENA_READ_RUN_COLS)),
    _repeated_record("assemblies", _str_fields(_ASSEMBLY_COLS)),
    _repeated_record("symbionts_raw_data", _str_fields(_ENA_READ_RUN_COLS)),
    _repeated_record("symbionts_assemblies", _str_fields(_ASSEMBLY_COLS)),
    _repeated_record("metagenomes_raw_data", _str_fields(_ENA_READ_RUN_COLS)),
    _repeated_record("metagenomes_assemblies", _str_fields(_ASSEMBLY_COLS)),
    {"name": "symbionts_status", "type": "STRING", "mode": "REQUIRED"},
    {"name": "metagenomes_status", "type": "STRING", "mode": "REQUIRED"},
    {"name": "project_name", "type": "STRING", "mode": "REPEATED"},
]

FULL_METADATA_SCHEMA: StructType = struct_type_from_bq_fields(FULL_METADATA_FIELDS)

# The gate/log table (taxonomy_pipeline.py:90-102): flat, but mixes
# REQUIRED/NULLABLE and a TIMESTAMP — the incremental anti-join key table.
GATE_FIELDS: list[dict] = [
    {"name": "tax_id", "type": "INTEGER", "mode": "REQUIRED"},
    {"name": "scientific_name", "type": "STRING", "mode": "NULLABLE"},
    {"name": "status", "type": "STRING", "mode": "REQUIRED"},
    {"name": "date_seen", "type": "TIMESTAMP", "mode": "REQUIRED"},
]

GATE_SCHEMA: StructType = struct_type_from_bq_fields(GATE_FIELDS)
