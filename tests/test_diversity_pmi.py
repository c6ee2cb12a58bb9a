"""Categorical entropy/Gini features and PMI collocations — value parity
vs independent numpy/pure-Python computation, plus edge conventions."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from feature_extraction_spark.ops.diversity import categorical_entropy
from feature_extraction_spark.ops.lm import pmi_collocations


def test_entropy_matches_numpy(spark):
    rows = [(i % 5, ["a", "b", "c"][(i * 7) % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "g int, cat string")
    got = categorical_entropy(df, "cat", ["g"]).toPandas().set_index("g")
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["g", "cat"])
    for g, sub in pdf.groupby("g"):
        p = sub["cat"].value_counts(normalize=True).to_numpy()
        h = -(p * np.log(p)).sum()
        r = got.loc[g]
        assert abs(r["entropy"] - h) < 1e-12
        assert abs(r["norm_entropy"] - h / math.log(len(p))) < 1e-12
        assert abs(r["gini"] - (1 - (p**2).sum())) < 1e-12
        assert r["n"] == len(sub) and r["n_cats"] == len(p)


def test_entropy_edge_conventions(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "a"), (2, "b"), (3, None), (3, "z")],
        "g int, cat string",
    )
    got = categorical_entropy(df, "cat", ["g"]).toPandas().set_index("g")
    # single category: entropy 0, norm NaN (no scale), gini 0
    assert got.loc[1, "entropy"] == 0.0 and got.loc[1, "gini"] == 0.0
    assert math.isnan(got.loc[1, "norm_entropy"])
    # two equal categories: entropy ln2, norm 1, gini 0.5
    assert abs(got.loc[2, "entropy"] - math.log(2)) < 1e-12
    assert abs(got.loc[2, "norm_entropy"] - 1.0) < 1e-12
    # NULL counts as its own category, not dropped
    assert got.loc[3, "n_cats"] == 2 and got.loc[3, "n"] == 2


def test_pmi_matches_pure_python(spark):
    texts = [
        "new york is big", "new york city", "big apple new york",
        "the city is big", "new day in the city", "york new city big",
    ] * 3
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")
    got = pmi_collocations(df, min_count=2).toPandas()
    # pure-python reference
    from collections import Counter

    big, m1, m2 = Counter(), Counter(), Counter()
    for t in texts:
        w = t.lower().split()
        big.update(zip(w, w[1:]))
        m1.update(w[:-1])
        m2.update(w[1:])
    n2 = sum(big.values())
    assert len(got) == sum(1 for c in big.values() if c >= 2)
    for _, r in got.iterrows():
        c12 = big[(r["w1"], r["w2"])]
        assert r["c1"] == m1[r["w1"]] and r["c2"] == m2[r["w2"]]
        want = (
            math.log(c12 / n2)
            - math.log(m1[r["w1"]] / n2)
            - math.log(m2[r["w2"]] / n2)
        )
        assert abs(r["pmi"] - want) < 1e-12
        assert abs(r["npmi"] - want / -math.log(c12 / n2)) < 1e-12
        assert -1.0 - 1e-12 <= r["npmi"] <= 1.0 + 1e-12
    # the planted collocation scores high
    ny = got[(got["w1"] == "new") & (got["w2"] == "york")]
    assert len(ny) == 1 and ny["pmi"].iloc[0] > 0


def test_pmi_topk_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "alpha beta gamma alpha beta") for i in range(10)],
        "doc_id bigint, text string",
    )
    a = pmi_collocations(df, min_count=1, top_k=2).toPandas()
    b = pmi_collocations(df, min_count=1, top_k=2).toPandas()
    assert a[["w1", "w2"]].values.tolist() == b[["w1", "w2"]].values.tolist()
    assert len(a) == 2
