"""ASR-hypothesis directory source (reference S7:
archived/extract_transcript_feats.py:33-55) and the cross-hypothesis mean
(A7, :133-142): extract features per hypothesis, then average each feature
across hypotheses per entity.

Layout: one directory per call, N text files (one per ASR hypothesis);
each line: ``seg_id w1 w2 ...``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_hypothesis_dirs(spark: SparkSession, glob: str) -> DataFrame:
    """One row per (call, hypothesis, segment): call from the parent dir
    name, hypothesis from the file name, seg_id = first token, text = rest."""
    raw = spark.read.text(glob).select(
        F.input_file_name().alias("path"), "value"
    )
    parts = F.split(F.col("path"), "/")

    def _name(idx: int):
        # input_file_name() yields a percent-encoded URI: decode so a dir
        # named 'call 01' joins metadata as 'call 01', not 'call%2001'
        # (try_url_decode: a literal '%' in a real name must not throw)
        seg = F.element_at(parts, idx)
        return F.coalesce(F.try_url_decode(seg), seg)

    toks = F.split(F.col("value"), " ", 2)
    return raw.filter(F.length(F.trim("value")) > 0).select(
        _name(-2).alias("call_id"),
        _name(-1).alias("hypothesis_id"),
        F.element_at(toks, 1).alias("seg_id"),
        F.coalesce(
            F.when(F.size(toks) >= 2, F.element_at(toks, 2)), F.lit("")
        ).alias("text"),
    )


def mean_across_hypotheses(
    per_hypothesis_feats: DataFrame,
    entity_keys: list[str],
    hypothesis_col: str = "hypothesis_id",
) -> DataFrame:
    """A7: average every numeric feature column across hypotheses.
    Engine analog: averaging features across sampled generations."""
    feat_cols = [
        f.name
        for f in per_hypothesis_feats.schema.fields
        if f.name not in entity_keys + [hypothesis_col]
        and f.dataType.typeName() in ("double", "float", "integer", "long")
    ]
    return per_hypothesis_feats.groupBy(*entity_keys).agg(
        *[F.mean(c).alias(c) for c in feat_cols]
    )
