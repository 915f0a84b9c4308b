"""Phase-0 schema artifacts: the BQ-JSON -> StructType loader must
reproduce REQUIRED/NULLABLE/REPEATED and RECORD nesting exactly
(reference convert_dict_to_table_schema, helpers.py:69-87)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructType,
    TimestampType,
)

from biodiversity_data_ingestion_spark.schemas import (
    GATE_SCHEMA,
    METADATA_SCHEMA,
    struct_type_from_bq_fields,
)


def test_loader_modes_and_types():
    s = struct_type_from_bq_fields(
        [
            {"name": "id", "type": "INTEGER", "mode": "REQUIRED"},
            {"name": "name", "type": "STRING"},  # mode defaults NULLABLE
            {"name": "score", "type": "FLOAT", "mode": "NULLABLE"},
            {"name": "tags", "type": "STRING", "mode": "REPEATED"},
        ]
    )
    assert s["id"].dataType == LongType() and s["id"].nullable is False
    assert s["name"].dataType == StringType() and s["name"].nullable is True
    assert s["score"].dataType == DoubleType()
    tags = s["tags"]
    assert tags.dataType == ArrayType(StringType(), containsNull=False)
    assert tags.nullable is False  # BQ REPEATED arrays default to empty, never NULL


def test_loader_nested_records_recursive():
    s = struct_type_from_bq_fields(
        [
            {
                "name": "outer",
                "type": "RECORD",
                "mode": "REPEATED",
                "fields": [
                    {"name": "k", "type": "STRING", "mode": "REQUIRED"},
                    {
                        "name": "inner",
                        "type": "RECORD",
                        "mode": "REPEATED",
                        "fields": [{"name": "v", "type": "INTEGER", "mode": "NULLABLE"}],
                    },
                ],
            }
        ]
    )
    outer = s["outer"].dataType
    assert isinstance(outer, ArrayType)
    elem = outer.elementType
    assert isinstance(elem, StructType) and elem["k"].nullable is False
    inner = elem["inner"].dataType
    assert isinstance(inner, ArrayType) and isinstance(inner.elementType, StructType)


def test_loader_rejects_unknown_type():
    with pytest.raises(ValueError, match="GEOGRAPHY"):
        struct_type_from_bq_fields([{"name": "g", "type": "GEOGRAPHY"}])


def test_metadata_schema_shape():
    # the 3-deep path the SQL views explode:
    # organisms[] -> characteristics[] -> leaf strings
    organisms = METADATA_SCHEMA["organisms"].dataType
    assert isinstance(organisms, ArrayType)
    org = organisms.elementType
    assert org["biosample_id"].nullable is False
    chars = org["characteristics"].dataType
    assert isinstance(chars, ArrayType)
    assert chars.elementType["field_name"].nullable is False
    # REQUIRED RECORD-of-RECORDs tree: seven ranks, each non-null struct
    tree = METADATA_SCHEMA["phylogenetic_tree"]
    assert tree.nullable is False
    assert [f.name for f in tree.dataType.fields] == [
        "kingdom", "phylum", "class", "order", "family", "genus", "species",
    ]
    assert all(f.nullable is False for f in tree.dataType.fields)
    # REPEATED scalar
    assert METADATA_SCHEMA["project_name"].dataType == ArrayType(
        StringType(), containsNull=False
    )


def test_gate_schema_timestamp():
    assert GATE_SCHEMA["date_seen"].dataType == TimestampType()
    assert GATE_SCHEMA["date_seen"].nullable is False


def test_full_metadata_schema_mirrors_reference():
    # the COMPLETE metadata table (reference beam schemas.py:1-1139):
    # exact top-level field order, the three ENA read-run repeats, and
    # the full leaf count
    from biodiversity_data_ingestion_spark.schemas import FULL_METADATA_SCHEMA

    assert [f.name for f in FULL_METADATA_SCHEMA.fields] == [
        "tax_id", "scientific_name", "common_name", "current_status",
        "organisms", "specimens", "phylogenetic_tree",
        "phylogenetic_tree_scientific_names", "phylogenetic_tree_common_names",
        "symbionts", "metagenomes", "raw_data", "assemblies",
        "symbionts_raw_data", "symbionts_assemblies",
        "metagenomes_raw_data", "metagenomes_assemblies",
        "symbionts_status", "metagenomes_status", "project_name",
    ]

    def leaves(dt):
        if isinstance(dt, StructType):
            return sum(1 + leaves(f.dataType) for f in dt.fields)
        if isinstance(dt, ArrayType):
            return leaves(dt.elementType)
        return 0

    assert leaves(FULL_METADATA_SCHEMA) == 221

    for rd in ("raw_data", "symbionts_raw_data", "metagenomes_raw_data"):
        el = FULL_METADATA_SCHEMA[rd].dataType.elementType
        assert len(el.fields) == 49
        assert el.fields[0].name == "study_accession"
        assert el.fields[-1].name == "library_construction_protocol"
        assert all(f.dataType == StringType() and f.nullable for f in el.fields)
    org = FULL_METADATA_SCHEMA["organisms"].dataType.elementType
    assert len(org.fields) == 10 and org["biosample_id"].nullable is False
    assert len(FULL_METADATA_SCHEMA["specimens"].dataType.elementType.fields) == 7
    assert len(FULL_METADATA_SCHEMA["symbionts"].dataType.elementType.fields) == 5
    tree = FULL_METADATA_SCHEMA["phylogenetic_tree"]
    assert tree.nullable is False and len(tree.dataType.fields) == 7
