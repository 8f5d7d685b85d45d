"""Draft-4 validation of a JSON string column — the row-wise reference
semantics (one document at a time, src/JSONSchema/Types.hs:20-26)
running distributed: the validator is compiled ONCE per Python worker
(driver ships the schema dict; closure materializes the validator
lazily), and rows stream through Arrow batches via mapInPandas — never
per-row Python UDF calls."""

from __future__ import annotations

import json
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame

FAILURE_FIELDS = "array<struct<keyword:string,instance_path:string,schema_path:string,message:string,value:string>>"


def validate_json_column(
    df: DataFrame,
    json_col: str,
    schema: dict[str, Any],
    registry: dict[str, Any] | None = None,
    valid_col: str = "_valid",
    failures_col: str = "_failures_json",
) -> DataFrame:
    """Append ``_valid`` (boolean; NULL json => NULL) and
    ``_failures_json`` (array of failure structs) columns."""
    from pyspark.sql.types import ArrayType, BooleanType, StructField, StructType, StringType

    fail_struct = StructType(
        [
            StructField("keyword", StringType()),
            StructField("instance_path", StringType()),
            StructField("schema_path", StringType()),
            StructField("message", StringType()),
            StructField("value", StringType()),
        ]
    )
    result_schema = StructType(
        list(df.schema.fields)
        + [StructField(valid_col, BooleanType()), StructField(failures_col, ArrayType(fail_struct))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # compiled once per worker (fixes the reference's rebuild-per-
        # recursion anti-pattern, Spec.hs:144-150)
        from hjsonschema_spark.draft4.validator import Draft4Validator, loads_json

        v = Draft4Validator(schema, registry=registry)
        for pdf in batches:
            valids: list[bool | None] = []
            fails: list[list | None] = []
            for s in pdf[json_col]:
                if s is None:
                    valids.append(None)
                    fails.append(None)
                    continue
                try:
                    doc = loads_json(s)
                except (ValueError, TypeError) as e:
                    valids.append(False)
                    fails.append([("parse", "", "", f"invalid JSON: {e}", str(s)[:256])])
                    continue
                errs = v.validate(doc)
                valids.append(not errs)
                fails.append([f.as_row() for f in errs])
            out = pdf.copy()
            out[valid_col] = pd.Series(valids, index=pdf.index, dtype="object")
            out[failures_col] = pd.Series(fails, index=pdf.index, dtype="object")
            yield out

    return df.mapInPandas(run, result_schema)
