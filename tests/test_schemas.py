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
