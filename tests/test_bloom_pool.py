"""Bloom-prefiltered decontamination (exactness vs the broadcast-hash
path, including under a deliberately FP-heavy filter) and embedding
pooling (numpy parity, ragged guard, normalization)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from feature_extraction_spark.ops.dedup import decontaminate, decontaminate_bloom
from feature_extraction_spark.ops.similarity import pool_embeddings

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def embs(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    df.count()
    return df


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_bloom_equals_exact(docs):
    bench = docs.filter(F.col("doc_id") % 37 == 0).select("text")
    exact = _ids(decontaminate(docs, bench, n=8))
    bloom = _ids(decontaminate_bloom(docs, bench, n=8))
    assert bloom == exact
    assert len(exact) < docs.count()  # the benchmark really removed docs


def test_bloom_exact_under_heavy_false_positives(docs):
    """1 bit/key + 1 probe saturates the filter — most of the corpus gets
    flagged — yet verification restores the exact output."""
    bench = docs.filter(F.col("doc_id") % 37 == 0).select("text")
    exact = _ids(decontaminate(docs, bench, n=8))
    bloom = _ids(
        decontaminate_bloom(docs, bench, n=8, bits_per_key=1, num_hashes=1)
    )
    assert bloom == exact


def test_bloom_rejects_bad_bits():
    with pytest.raises(ValueError, match="bits_per_key"):
        decontaminate_bloom(None, None, bits_per_key=0)


def test_pool_mean_matches_numpy(spark):
    rows = [
        ("a", [1.0, 2.0, 3.0]),
        ("a", [3.0, 4.0, 5.0]),
        ("b", [10.0, 20.0, 30.0]),
    ]
    df = spark.createDataFrame(rows, "grp string, embedding array<double>")
    got = {
        r["grp"]: (r["n_rows"], r["pooled"])
        for r in pool_embeddings(df, "grp").collect()
    }
    assert got["a"][0] == 2
    assert np.allclose(got["a"][1], [2.0, 3.0, 4.0])
    assert got["b"][0] == 1
    assert np.allclose(got["b"][1], [10.0, 20.0, 30.0])


def test_pool_methods_and_normalize(spark):
    rows = [("a", [3.0, 0.0]), ("a", [0.0, 4.0])]
    df = spark.createDataFrame(rows, "grp string, embedding array<double>")
    s = pool_embeddings(df, "grp", method="sum").collect()[0]["pooled"]
    assert np.allclose(s, [3.0, 4.0])
    m = pool_embeddings(df, "grp", method="max").collect()[0]["pooled"]
    assert np.allclose(m, [3.0, 4.0])
    nrm = pool_embeddings(df, "grp", method="sum", normalize=True).collect()[0][
        "pooled"
    ]
    assert np.allclose(nrm, [0.6, 0.8])
    # zero vector stays zero, not NaN
    z = spark.createDataFrame(
        [("z", [0.0, 0.0])], "grp string, embedding array<double>"
    )
    zp = pool_embeddings(z, "grp", normalize=True).collect()[0]["pooled"]
    assert np.allclose(zp, [0.0, 0.0])


def test_pool_null_rows_ignored(spark):
    rows = [("a", [1.0, 3.0]), ("a", None)]
    df = spark.createDataFrame(rows, "grp string, embedding array<double>")
    r = pool_embeddings(df, "grp").collect()[0]
    assert r["n_rows"] == 1
    assert np.allclose(r["pooled"], [1.0, 3.0])


def test_pool_ragged_raises(spark):
    rows = [("a", [1.0, 2.0]), ("a", [1.0, 2.0, 3.0])]
    df = spark.createDataFrame(rows, "grp string, embedding array<double>")
    with pytest.raises(Exception, match="ragged"):
        pool_embeddings(df, "grp").collect()


def test_pool_bad_method(spark):
    df = spark.createDataFrame([("a", [1.0])], "grp string, embedding array<double>")
    with pytest.raises(ValueError, match="method"):
        pool_embeddings(df, "grp", method="median")


def test_pool_real_embeddings_by_label(embs):
    """Mean-pool the testdata embeddings by label and check one label
    against numpy."""
    out = {
        r["label"]: np.array(r["pooled"])
        for r in pool_embeddings(embs, "label").collect()
    }
    import pandas as pd

    pdf = embs.select("label", "embedding").toPandas()
    for lbl, grp in pdf.groupby("label"):
        exp = np.mean(
            np.stack(grp["embedding"].map(np.asarray).to_numpy()).astype("float64"),
            axis=0,
        )
        assert np.allclose(out[lbl], exp, atol=1e-9), f"label {lbl}"
