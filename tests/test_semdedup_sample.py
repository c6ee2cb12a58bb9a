"""SemDeDup (cluster-scoped embedding dedup) and exact stratified sampling."""

import math

import pytest
from pyspark.sql import functions as F

from feature_extraction_spark.ops.chunk import stratified_sample_exact
from feature_extraction_spark.ops.similarity import (
    cosine_neardup_pairs,
    ivf_train,
    semdedup,
    semdedup_pairs,
)


def _unit(angle):
    return [math.cos(angle), math.sin(angle), 0.0, 0.0]


@pytest.fixture(scope="module")
def emb(spark):
    # three well-separated direction groups; within each, vectors a few
    # milliradians apart (cosine ~ 0.99997) -> planted duplicate groups
    rows = []
    vid = 0
    for g, base in enumerate([0.1, 1.7, 3.3]):
        for j in range(4):
            rows.append((vid, _unit(base + 0.003 * j)))
            vid += 1
    # plus isolated singletons between the groups (no near-dup partner)
    for k, a in enumerate([0.9, 2.5, 4.1]):
        rows.append((100 + k, _unit(a)))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_pairs_match_exact(emb):
    cents = ivf_train(emb, n_centroids=3, iters=2, seed=42)
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in semdedup_pairs(emb, cents, threshold=0.95).collect()
    }
    want = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_neardup_pairs(emb, threshold=0.95, method="exact").collect()
    }
    assert got.keys() == want.keys()  # clustering split no true pair here
    for k in got:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_semdedup_keeps_min_id_per_group(emb):
    kept = {r.vec_id for r in semdedup(emb, threshold=0.95, n_clusters=3).collect()}
    # one survivor per planted group (its min id) + all singletons
    assert kept == {0, 4, 8, 100, 101, 102}


def test_semdedup_threshold_one_keeps_everything(emb):
    kept = semdedup(emb, threshold=1.0 + 1e-9, n_clusters=3).count()
    assert kept == emb.count()


def test_stratified_exact_quota_and_determinism(spark):
    rows = [(i, "big") for i in range(50)]
    rows += [(100 + i, "mid") for i in range(5)]
    rows += [(200, "tiny")]
    df = spark.createDataFrame(rows, "id long, stratum string")

    s3 = stratified_sample_exact(df, "stratum", 3, key_cols="id", salt="s")
    got = s3.groupBy("stratum").count().collect()
    assert {r.stratum: r["count"] for r in got} == {"big": 3, "mid": 3, "tiny": 1}

    # deterministic: a second draw is identical
    again = stratified_sample_exact(df, "stratum", 3, key_cols="id", salt="s")
    assert {r.id for r in s3.collect()} == {r.id for r in again.collect()}

    # salt changes the draw (on the 50-row stratum, collision odds ~ 0)
    other = stratified_sample_exact(df, "stratum", 3, key_cols="id", salt="t")
    big_a = {r.id for r in s3.filter(F.col("stratum") == "big").collect()}
    big_b = {r.id for r in other.filter(F.col("stratum") == "big").collect()}
    assert big_a != big_b

    # nested: the n=2 draw is a subset of the n=4 draw at the same salt
    s2 = {r.id for r in stratified_sample_exact(df, "stratum", 2, "id", "s").collect()}
    s4 = {r.id for r in stratified_sample_exact(df, "stratum", 4, "id", "s").collect()}
    assert s2 <= s4


def test_stratified_exact_validates(spark):
    df = spark.createDataFrame([(1, "a")], "id long, stratum string")
    with pytest.raises(ValueError):
        stratified_sample_exact(df, "stratum", 0, key_cols="id")


def test_stratified_exact_assert_unique_keys(spark):
    uniq = spark.createDataFrame(
        [(i, "s") for i in range(10)], "id long, stratum string"
    )
    # unique keys: the assertion passes and the draw proceeds
    got = stratified_sample_exact(
        uniq, "stratum", 3, key_cols="id", assert_unique_keys=True
    )
    assert got.count() == 3

    dup = spark.createDataFrame(
        [(i % 3, "s") for i in range(9)], "id long, stratum string"
    )
    with pytest.raises(ValueError, match="not unique"):
        stratified_sample_exact(
            dup, "stratum", 2, key_cols="id", assert_unique_keys=True
        )
    # with a tiebreak the contract is satisfied differently; the assertion
    # is skipped by design
    ok = stratified_sample_exact(
        dup, "stratum", 2, key_cols="id",
        tiebreak_cols="row", assert_unique_keys=True,
    )
    assert ok.count() == 2


def test_stratified_exact_duplicate_keys_tiebreak(spark):
    # key_cols NOT unique: 10 ids x 3 copies with distinct payloads.
    rows = [(i, "s", f"payload-{i}-{j}") for i in range(10) for j in range(3)]
    df = spark.createDataFrame(rows, "id long, stratum string, payload string")
    a = stratified_sample_exact(
        df, "stratum", 7, key_cols="id", salt="s", tiebreak_cols="row"
    )
    b = stratified_sample_exact(
        df.repartition(13), "stratum", 7, key_cols="id", salt="s", tiebreak_cols="row"
    )
    # the drawn MULTISET (including payloads) is identical regardless of
    # the physical input layout
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.count() == 7
