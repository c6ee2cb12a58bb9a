"""Parity: Spark verbosity pack vs pandas oracle (reference kernel math:
text_features/extract_verbosity_stats.py), allclose per entity."""

import numpy as np

from feature_extraction_spark.oracle import kernels as ok
from feature_extraction_spark.ops.turn_stats import verbosity_stats

FEATS = [
    "wc_mean", "wc_median", "wc_stdev", "wc_min", "wc_max",
    "total_count", "lw_count", "word_len",
    "syll_mean", "syll_median", "syll_stdev", "syll_min", "syll_max",
]


def test_verbosity_conv_level_parity(spark, transcripts, transcripts_pd):
    got = verbosity_stats(transcripts, level="conv").toPandas().set_index("conv_id")

    pdf = transcripts_pd.sort_values(["conv_id", "turn_idx"])
    for conv_id, g in pdf.groupby("conv_id"):
        expected = ok.verbosity_stats(list(g["text"]))
        row = got.loc[conv_id]
        for f in FEATS:
            assert np.allclose(row[f], expected[f], equal_nan=True), (
                f"{conv_id} {f}: spark={row[f]} oracle={expected[f]}"
            )
    assert len(got) == pdf["conv_id"].nunique()


def test_verbosity_empty_text_turn(spark):
    # '' tokenizes to [''] -> wc=1, word_len counts the empty word as len 0
    import datetime as dt

    df = spark.createDataFrame(
        [("c1", 0, "user", "", None, dt.datetime(2024, 1, 1))],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    row = verbosity_stats(df, level="conv").collect()[0]
    exp = ok.verbosity_stats([""])
    assert row["wc_mean"] == 1.0
    assert row["word_len"] == 0.0
    assert np.allclose(row["syll_mean"], exp["syll_mean"], equal_nan=True)
    assert not np.isnan(row["lw_count"])  # total_count=1 -> ratio 0.0
    assert row["lw_count"] == 0.0
