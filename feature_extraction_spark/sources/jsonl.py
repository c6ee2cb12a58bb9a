"""JSONL (newline-delimited JSON) transcript source with corrupt-record
quarantine — the raw-format ingestion path for conversation/agent logs.

The reference ingests CSVs and pickles (e.g. load_dataset in
microsoft_asr_features/extract_timing_features.py); real transcript dumps
arrive as JSONL, so this source adds schema-on-read parsing where
malformed lines are CAPTURED, never dropped silently and never fatal:
Spark's PERMISSIVE mode routes each unparseable raw line into a corrupt
column, and `quarantine` splits good rows from a dead-letter frame.

Scale notes (100 TB): both readers are plain distributed scans — the JSON
parser runs inside the JVM per input split (no Python), an explicit
schema avoids the schema-inference pre-pass over the whole input, and
corrupt handling is a column, not a driver-side filter, so the quarantine
split is two pushed-down filters over one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: canonical transcript schema (BASELINE input_hint) as a DDL string
TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _with_corrupt(
    schema: str | StructType, corrupt_col: str
) -> str | StructType:
    """Append the corrupt column to the schema. StructType inputs are
    extended STRUCTURALLY (never via simpleString surgery, which mangles
    the colons inside nested struct/array element types into invalid
    DDL); plain DDL strings get a trailing field."""
    if isinstance(schema, StructType):
        return StructType(
            list(schema.fields) + [StructField(corrupt_col, StringType())]
        )
    return f"{schema}, {corrupt_col} string"


def parse_jsonl(
    df: DataFrame,
    json_col: str = "json",
    schema: str | StructType = TRANSCRIPT_DDL,
    corrupt_col: str = "_corrupt",
) -> DataFrame:
    """Parse a string column of JSON lines against an explicit schema.
    Adds one column per schema field plus `corrupt_col`, which carries the
    RAW line whenever the parser could not fully honor the schema
    (malformed JSON or a type mismatch — Spark PERMISSIVE semantics);
    well-parsed rows have it NULL. The input column is preserved upstream
    of the select, so callers can keep or drop it."""
    parsed = F.from_json(
        F.col(json_col),
        _with_corrupt(schema, corrupt_col),
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
    )
    others = [c for c in df.columns if c != json_col]
    return df.withColumn("_parsed", parsed).select(*others, "_parsed.*")


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | StructType = TRANSCRIPT_DDL,
    corrupt_col: str = "_corrupt",
) -> DataFrame:
    """Distributed JSONL scan with schema-on-read + corrupt capture: an
    explicit schema (no inference pre-pass over 100 TB), PERMISSIVE mode,
    and the raw line of every malformed record in `corrupt_col`.

    Implemented as ONE text scan + from_json rather than the json
    datasource: identical parse semantics, but the corrupt column is then
    an ordinary derived column — Spark's json reader disallows queries
    that reference ONLY its internal corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), which would
    make the dead-letter side of `quarantine` throw. Blank lines are
    skipped, matching the json datasource."""
    raw = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    return parse_jsonl(
        raw, json_col="value", schema=schema, corrupt_col=corrupt_col
    )


def quarantine(
    df: DataFrame, corrupt_col: str = "_corrupt"
) -> tuple[DataFrame, DataFrame]:
    """Split parsed output into (good, dead_letter): good rows with the
    corrupt column dropped, and the dead-letter frame holding ONLY the
    raw lines (for reprocessing). Two filters over the same scan."""
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw")
    )
    return good, bad
