"""Microsoft-ASR recognizer CSV source (reference S1/S2/F10).

The reference reads many per-call ``recognizer.csv`` files, concatenates
them, and hand-parses the ``word_timing`` column — a Python-repr list of
dicts — with string surgery (extract_timing_features.py:74-100). Here:
one multi-path CSV scan (union implicit), feature-detected columns
(feature_id | audio_file_id, order | segment_number,
extract_text_features.py:71-75), and ``word_timing`` normalized to JSON and
parsed with ``from_json`` into a typed array<struct> — columnar, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_extraction_spark.schema import WORD_TIMING_ELEM
from pyspark.sql import types as T


def read_recognizer_csv(
    spark: SparkSession, paths: list[str] | str
) -> DataFrame:
    """Multi-path scan of recognizer CSVs with the timing columns typed."""
    df = spark.read.option("header", True).option("escape", '"').csv(paths)

    # feature detection: grouping key and sort key fallbacks
    group_col = "feature_id" if "feature_id" in df.columns else "audio_file_id"
    sort_col = "order" if "order" in df.columns else "segment_number"
    df = df.withColumn("group_id", F.col(group_col)).withColumn(
        "sort_key", F.col(sort_col).cast("long")
    )

    for c, t in (("duration", "long"), ("offset", "long"), ("confidence", "double")):
        if c in df.columns:
            df = df.withColumn(c, F.col(c).cast(t))

    if "word_timing" in df.columns:
        # python-repr -> JSON. A blanket '->" replacement corrupts words
        # containing apostrophes: repr double-quotes those values
        # ({'Word': "don't"}), so the naive swap yields "don"t" — invalid
        # JSON — and from_json silently NULLs the whole array. Convert only
        # the DELIMITER singles: keys ('Word':) and single-quoted values,
        # which by repr's own rule contain no apostrophes.
        js = F.regexp_replace(
            F.col("word_timing"),
            r"'([A-Za-z_][A-Za-z_0-9]*)'(\s*:)",
            '"$1"$2',
        )
        js = F.regexp_replace(js, r"(:\s*)'([^']*)'", '$1"$2"')
        df = df.withColumn(
            "word_timing", F.from_json(js, T.ArrayType(WORD_TIMING_ELEM))
        )
    return df
