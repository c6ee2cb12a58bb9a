"""Stateful streaming sessionizer (applyInPandasWithState) vs batch."""

import pandas as pd
import pyspark.sql.functions as F


def test_stateful_sessionize_matches_batch(spark, transcripts, tmp_path):
    from feature_extraction_spark.ops.sessionize import session_bounds
    from feature_extraction_spark.streaming.stateful import (
        stream_sessionize_stateful,
    )

    src = str(tmp_path / "src")
    transcripts.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(transcripts.schema).parquet(src)

    out_path = str(tmp_path / "out")
    q = (
        stream_sessionize_stateful(stream, gap_seconds=300.0, watermark="0 seconds")
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out_path).toPandas()
    exp = session_bounds(transcripts, gap_seconds=300.0).toPandas()
    exp["start_us"] = exp["session_start"].astype("int64") // 1000
    exp["end_us"] = exp["session_end"].astype("int64") // 1000

    # every emitted session must exactly match a batch session
    merged = got.merge(
        exp,
        left_on=["conv_id", "session_start_us", "session_end_us"],
        right_on=["conv_id", "start_us", "end_us"],
        how="left",
    )
    assert merged["session_id_y"].notna().all()
    assert (merged["n_turns_x"] == merged["n_turns_y"]).all()

    # sessions the stream closed mid-batch (gap seen within data) must all
    # be emitted: batch sessions that are NOT the last of their conv
    last = exp.sort_values("start_us").groupby("conv_id").tail(1)
    must_emit = exp.merge(
        last[["conv_id", "session_id"]],
        on=["conv_id", "session_id"],
        how="left",
        indicator=True,
    )
    must_emit = must_emit[must_emit["_merge"] == "left_only"]
    got_keys = {(r.conv_id, r.session_start_us) for r in got.itertuples()}
    missing = [
        (r.conv_id, r.start_us)
        for r in must_emit.itertuples()
        if (r.conv_id, r.start_us) not in got_keys
    ]
    assert not missing, f"unclosed mid-stream sessions: {missing[:5]}"
    assert isinstance(got, pd.DataFrame)
