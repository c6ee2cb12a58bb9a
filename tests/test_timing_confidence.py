"""Parity: timing + confidence packs vs pandas oracle on the synthetic
ASR-segment table (word_timing arrays, durations dimension)."""

import numpy as np
import pytest

from feature_extraction_spark.oracle import kernels as ok
from feature_extraction_spark.ops.confidence import confidence_stats
from feature_extraction_spark.ops.timing import timing_stats
from feature_extraction_spark.synth import synth_asr_segments, synth_durations

TIMING_FEATS = (
    [f"{st}_{s}" for st in ("segments", "silences", "words", "wps")
     for s in ("max", "min", "mean", "med", "std")]
    + ["sil_duration", "spk_duration", "spk_sil_ratio", "sps", "wps",
       "sil_count", "short_utt_count", "segment_count", "word_count",
       "total_duration", "spk_ratio", "sil_ratio", "segs_per_min",
       "short_utts_per_min"]
)


@pytest.fixture(scope="module")
def segments(spark):
    df = synth_asr_segments(spark, n_convs=50, seed=42, max_turns=200).cache()
    df.count()
    return df


def _oracle_times(g):
    """Build the reference times_dict from the turn rows of one entity."""
    times = {"segments": [], "silences": [], "words": [], "wps": []}
    for _, seg in g.sort_values("turn_idx").iterrows():
        seg_sec = seg["duration"] * 1e-7
        times["segments"].append(seg_sec)
        wt = list(seg["word_timing"]) if seg["word_timing"] is not None else []
        for w in wt:
            times["words"].append(w["Duration"] * 1e-4)
        times["wps"].append(len(wt) / seg_sec)
        sils = []
        for i, w in enumerate(wt):
            if i == 0:
                sils.append((w["Offset"] - seg["offset"]) * 1e-4)
            else:
                prev = wt[i - 1]
                sils.append((w["Offset"] - (prev["Offset"] + prev["Duration"])) * 1e-4)
            if i == len(wt) - 1:
                end_seg = seg["offset"] + seg["duration"]
                sils.append((end_seg - (w["Offset"] + w["Duration"])) * 1e-4)
        times["silences"].extend([x for x in sils if x != 0])
    return times


def test_timing_parity(spark, segments):
    durations = synth_durations(segments)
    got = (
        timing_stats(segments, level="conv", durations=durations)
        .toPandas()
        .set_index("conv_id")
    )
    pdf = segments.toPandas()
    dur_pd = durations.toPandas().set_index("conv_id")
    n_checked = 0
    for conv_id, g in pdf.groupby("conv_id"):
        times = _oracle_times(g)
        total = dur_pd.loc[conv_id, "duration_ms"] * 1e-3
        exp = ok.timing_stats(times, total)
        row = got.loc[conv_id]
        for f in TIMING_FEATS:
            assert np.allclose(row[f], exp[f], equal_nan=True), (
                f"{conv_id} {f}: spark={row[f]} oracle={exp[f]}"
            )
        n_checked += 1
    assert n_checked == len(got)


def test_timing_empty_word_lists(spark, segments):
    # turns with empty text produce empty word_timing: silences/words NaN
    # bundles but segment stats still real
    import pyspark.sql.functions as F

    empties = segments.filter(F.size("word_timing") == 0)
    assert empties.count() > 0  # synth guarantees some empty turns
    one_conv = empties.select("conv_id").limit(1).collect()[0][0]
    sub = segments.filter(
        (F.col("conv_id") == one_conv) & (F.size("word_timing") == 0)
    )
    row = timing_stats(sub, level="conv").collect()[0]
    assert np.isnan(row["words_mean"])
    assert row["word_count"] == 0.0
    assert row["segment_count"] >= 1.0


def test_confidence_parity(spark, segments):
    got = confidence_stats(segments, level="conv").toPandas().set_index("conv_id")
    pdf = segments.toPandas()
    for conv_id, g in pdf.groupby("conv_id"):
        exp = ok.conf_stats(list(g["confidence"]))
        row = got.loc[conv_id]
        for f in ("conf_max", "conf_mean", "conf_std", "conf_min", "conf_med"):
            assert np.allclose(row[f], exp[f], equal_nan=True)


def test_timing_null_word_timing(spark, segments):
    """NULL word_timing (no ASR word output) must NOT drop the turn from the
    segment-grain aggregates (regression: F.concat of a NULL array is NULL,
    which exploded to zero rows). The turn counts in segment stats with
    wps 0 (same as an empty word list) and emits no word/silence rows."""
    import pyspark.sql.functions as F

    one_conv = segments.select("conv_id").limit(1).collect()[0][0]
    sub = segments.filter(F.col("conv_id") == one_conv)
    n_turns = sub.count()
    nulled = sub.withColumn(
        "word_timing",
        F.when(F.col("turn_idx") == 0, F.lit(None)).otherwise(
            F.col("word_timing")
        ),
    )
    base = timing_stats(sub, level="conv").collect()[0]
    got = timing_stats(nulled, level="conv").collect()[0]
    # every turn still counted at the segment grain
    assert got["segment_count"] == float(n_turns) == base["segment_count"]
    assert np.isclose(got["spk_duration"], base["spk_duration"])
    # an all-NULL-word_timing entity still yields a row
    all_null = sub.withColumn("word_timing", F.lit(None).cast(sub.schema["word_timing"].dataType))
    row = timing_stats(all_null, level="conv").collect()[0]
    assert row["segment_count"] == float(n_turns)
    assert row["word_count"] == 0.0 and row["sil_count"] == 0.0
    assert np.isnan(row["words_mean"]) and np.isnan(row["silences_mean"])
    assert row["wps_mean"] == 0.0  # NULL word list ≡ empty list -> wps 0


def test_confidence_all_null_entity_keeps_nan_row(spark):
    """Regression (round-2 review): an entity whose every score is NULL
    must yield a NaN row, not disappear (the 'NaN, never NULL' contract)."""
    import math

    from feature_extraction_spark.ops.confidence import confidence_stats

    df = spark.createDataFrame(
        [("a", 0.5), ("a", 0.7), ("b", None), ("b", None)],
        "conv_id string, confidence double",
    )
    out = {r["conv_id"]: r for r in confidence_stats(df, level="conv").collect()}
    assert set(out) == {"a", "b"}
    assert abs(out["a"]["conf_mean"] - 0.6) < 1e-12
    assert all(
        math.isnan(out["b"][c])
        for c in ("conf_max", "conf_mean", "conf_std", "conf_min", "conf_med")
    )
