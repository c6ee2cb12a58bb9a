"""Canonical schemas.

The transcripts table shape is fixed by ``BASELINE.json:input_hint``:
one row per conversational turn. The reference engine's equivalent is the
segment/turn table assembled by CSV concat
(reference: microsoft_asr_features/extract_text_features.py:62-87).
"""

from pyspark.sql import types as T

# One row per conversational turn (= reference ASR "segment").
TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# Optional timing extension columns (reference Microsoft ASR variant,
# extract_timing_features.py:119-121): durations/offsets in 100-ns units,
# word_timing as a typed array of structs instead of a stringified list.
WORD_TIMING_ELEM = T.StructType(
    [
        T.StructField("Word", T.StringType(), True),
        T.StructField("Duration", T.LongType(), True),
        T.StructField("Offset", T.LongType(), True),
    ]
)

TRANSCRIPTS_TIMING_SCHEMA = T.StructType(
    TRANSCRIPTS_SCHEMA.fields
    + [
        T.StructField("duration", T.LongType(), True),  # 100-ns units
        T.StructField("offset", T.LongType(), True),  # 100-ns units
        T.StructField("word_timing", T.ArrayType(WORD_TIMING_ELEM), True),
        T.StructField("confidence", T.DoubleType(), True),
    ]
)
