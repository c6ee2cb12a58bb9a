"""DSIR importance resampling (ops/dsir.py), SQ8/binary quantization
(ops/quantize.py), and the table profiler (ops/profile.py): exact value
parity against pure-Python references, invariants (smoothing, Gumbel
determinism, quantization error bounds, Hamming symmetry), and
plan-shape guards (encode/score = map-only or single-pass; top-k =
TakeOrderedAndProject; profiler scans the corpus once)."""

import hashlib
import math

import pyspark.sql.functions as F
import pytest

from feature_extraction_spark.ops.dsir import (
    dsir_fit,
    dsir_resample,
    dsir_score,
)
from feature_extraction_spark.ops.profile import profile_table
from feature_extraction_spark.ops.quantize import (
    binary_sign_codes,
    hamming_topk,
    pack_sign_words,
    sq8_encode,
    sq8_fit,
    sq8_topk,
)
from feature_extraction_spark.synth import synth_documents, synth_embeddings

B = 256  # small bucket space so collisions actually occur in tests


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------------ dsir


def _py_bucket(gram: str, salt: str, n_buckets: int) -> int:
    h = hashlib.md5(f"{gram}\x1f{salt}".encode()).hexdigest()
    return int(h[:8], 16) % n_buckets


def _py_grams(text: str) -> list[str]:
    ws = [w for w in text.lower().split() if w]
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _py_counts(texts, salt, n_buckets):
    c = {}
    for t in texts:
        for g in _py_grams(t or ""):
            b = _py_bucket(g, salt, n_buckets)
            c[b] = c.get(b, 0) + 1
    return c


@pytest.fixture(scope="module")
def docs(spark):
    df = synth_documents(spark, n_docs=400, seed=5).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def docs_pd(docs):
    return docs.toPandas()


def test_dsir_fit_matches_python(spark, docs, docs_pd):
    target = docs.filter(F.col("source") == "src0")
    model = dsir_fit(target, docs, n_buckets=B, alpha=0.5, salt="t")
    got = {r["bucket"]: r["lr"] for r in model.collect()}
    assert len(got) == B  # full domain, including unseen buckets

    tgt_texts = docs_pd[docs_pd.source == "src0"].text.tolist()
    tc = _py_counts(tgt_texts, "t", B)
    rc = _py_counts(docs_pd.text.tolist(), "t", B)
    tn, rn = sum(tc.values()), sum(rc.values())
    for b in range(B):
        exp = math.log((tc.get(b, 0) + 0.5) / (tn + 0.5 * B)) - math.log(
            (rc.get(b, 0) + 0.5) / (rn + 0.5 * B)
        )
        assert got[b] == pytest.approx(exp, rel=1e-12), b


def test_dsir_score_matches_python_and_keeps_empty_docs(spark, docs, docs_pd):
    target = docs.filter(F.col("source") == "src0")
    # plant an empty and a NULL text row: zero grams must keep a row
    extra = spark.createDataFrame(
        [(100_000, ""), (100_001, None)], "doc_id bigint, text string"
    )
    corpus = docs.select("doc_id", "text").unionByName(extra)
    model = dsir_fit(target, docs, n_buckets=B, alpha=0.5, salt="t")
    scored = dsir_score(corpus, model, n_buckets=B, salt="t")
    got = {r["doc_id"]: (r["n_grams"], r["dsir_logw"]) for r in scored.collect()}
    assert got[100_000] == (0, 0.0)
    assert got[100_001] == (0, 0.0)

    tgt_texts = docs_pd[docs_pd.source == "src0"].text.tolist()
    tc = _py_counts(tgt_texts, "t", B)
    rc = _py_counts(docs_pd.text.tolist(), "t", B)
    tn, rn = sum(tc.values()), sum(rc.values())

    def lr(b):
        return math.log((tc.get(b, 0) + 0.5) / (tn + 0.5 * B)) - math.log(
            (rc.get(b, 0) + 0.5) / (rn + 0.5 * B)
        )

    for _, row in docs_pd.head(25).iterrows():
        grams = _py_grams(row.text)
        exp_w = sum(lr(_py_bucket(g, "t", B)) for g in grams)
        n, w = got[row.doc_id]
        assert n == len(grams)
        assert w == pytest.approx(exp_w, rel=1e-9, abs=1e-9)


def test_dsir_target_docs_score_higher_on_average(spark, docs, docs_pd):
    """Sanity: importance weights separate target-like from raw docs."""
    target = docs.filter(F.col("lang") == "zh")
    model = dsir_fit(target, docs, n_buckets=2048, alpha=0.5, salt="sep")
    scored = dsir_score(docs, model, n_buckets=2048, salt="sep").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    rows = scored.groupBy(F.col("lang") == "zh").agg(
        F.avg("dsir_logw").alias("m")
    ).collect()
    means = {r[0]: r["m"] for r in rows}
    assert means[True] > means[False]


def test_dsir_resample_deterministic_gumbel(spark, docs):
    target = docs.filter(F.col("source") == "src0")
    model = dsir_fit(target, docs, n_buckets=B, alpha=0.5, salt="t")
    scored = dsir_score(docs, model, n_buckets=B, salt="t").cache()
    a = [r["doc_id"] for r in dsir_resample(scored, k=20, salt="g").collect()]
    b = [r["doc_id"] for r in dsir_resample(scored, k=20, salt="g").collect()]
    assert a == b and len(a) == 20

    # python replay of the gumbel keys
    rows = scored.collect()
    def key(r):
        h = hashlib.md5(f"{r['doc_id']}\x1fg".encode()).hexdigest()
        u = (int(h[:13], 16) + 0.5) / float(1 << 52)
        return r["dsir_logw"] - math.log(-math.log(u))
    exp = [r["doc_id"] for r in sorted(rows, key=lambda r: (-key(r), r["doc_id"]))][:20]
    assert a == exp

    # top-k plans as TakeOrderedAndProject (no global sort)
    plan = _plan(dsir_resample(scored, k=20, salt="g"))
    assert "TakeOrderedAndProject" in plan, plan


def test_dsir_validation():
    with pytest.raises(ValueError):
        dsir_resample(None, k=0)
    with pytest.raises(ValueError):
        dsir_resample(None, k=5, temperature=0.0)


# -------------------------------------------------------------- quantize


@pytest.fixture(scope="module")
def emb(spark):
    df = synth_embeddings(spark, n_vecs=300, seed=3).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def emb_pd(emb):
    return emb.toPandas()


def test_sq8_fit_bounds(emb, emb_pd):
    bounds = sq8_fit(emb)
    dim = len(emb_pd.embedding.iloc[0])
    assert len(bounds) == dim
    import numpy as np

    mat = np.array(emb_pd.embedding.tolist(), dtype="float64")
    assert bounds[0][0] == pytest.approx(float(mat[:, 0].min()), rel=1e-12)
    assert bounds[dim - 1][1] == pytest.approx(
        float(mat[:, dim - 1].max()), rel=1e-12
    )


def test_sq8_encode_matches_python_and_bounds_error(emb, emb_pd):
    bounds = sq8_fit(emb)
    enc = sq8_encode(emb, bounds)
    got = {r["vec_id"]: r["sq8_code"] for r in enc.collect()}
    import numpy as np

    max_step = max((hi - lo) / 255.0 for lo, hi in bounds)
    for _, row in emb_pd.head(20).iterrows():
        codes = got[row.vec_id]
        for i, x in enumerate(row.embedding):
            lo, hi = bounds[i]
            if hi == lo:
                assert codes[i] == 0
                continue
            exp = int(
                np.clip(round((float(x) - lo) * 255.0 / (hi - lo)), 0, 255)
            )
            assert codes[i] == exp
            # reconstruction error bounded by half a quantization step
            deq = lo + codes[i] * (hi - lo) / 255.0
            assert abs(deq - float(x)) <= max_step / 2 + 1e-9

    # encode is map-only: no exchange in the plan
    plan = _plan(enc)
    assert "Exchange" not in plan, plan


def test_sq8_topk_approximates_exact_l2(emb, emb_pd):
    import numpy as np

    bounds = sq8_fit(emb)
    q = [float(x) for x in emb_pd.embedding.iloc[7]]
    got = sq8_topk(sq8_encode(emb, bounds), bounds, q, k=10).collect()
    ids = [r["vec_id"] for r in got]
    mat = np.array(emb_pd.embedding.tolist(), dtype="float64")
    exact = np.sum((mat - np.array(q)) ** 2, axis=1)
    order = emb_pd.vec_id.values[np.lexsort((emb_pd.vec_id.values, exact))]
    # SQ8 is a fine quantizer: top-10 by dequantized L2 should recall most
    # of the exact top-10 on 64-dim data
    assert len(set(ids) & set(order[:10].tolist())) >= 8
    assert got[0]["sq8_dist"] <= got[-1]["sq8_dist"]
    plan = _plan(sq8_topk(sq8_encode(emb, bounds), bounds, q, k=10))
    assert "TakeOrderedAndProject" in plan, plan


def test_binary_sign_codes_match_python(emb, emb_pd):
    codes = binary_sign_codes(emb)
    got = {r["vec_id"]: list(r["sign_words"]) for r in codes.collect()}
    for _, row in emb_pd.head(30).iterrows():
        assert got[row.vec_id] == pack_sign_words(
            [float(x) for x in row.embedding]
        )
    plan = _plan(binary_sign_codes(emb, dim=64))
    assert "Exchange" not in plan, plan


def test_hamming_topk_matches_python(emb, emb_pd):
    q = [float(x) for x in emb_pd.embedding.iloc[7]]
    qw = pack_sign_words(q)
    got = hamming_topk(binary_sign_codes(emb), qw, k=15).collect()

    def ham(vec):
        w = pack_sign_words([float(x) for x in vec])
        return sum(bin(a ^ b).count("1") for a, b in zip(w, qw))

    exp = sorted(
        ((ham(r.embedding), r.vec_id) for _, r in emb_pd.iterrows())
    )[:15]
    assert [(r["hamming_dist"], r["vec_id"]) for r in got] == exp
    assert got[0]["hamming_dist"] == 0  # the query's own vector
    plan = _plan(hamming_topk(binary_sign_codes(emb), qw, k=15))
    assert "TakeOrderedAndProject" in plan, plan


def test_binary_sign_codes_validation(emb):
    with pytest.raises(ValueError):
        binary_sign_codes(emb.limit(0), dim=0)


# --------------------------------------------------------------- profile


def test_profile_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a", None),
            (2, "a", 1.5),
            (3, "b", 1.5),
            (4, None, 1.5),
            (5, "b", None),
        ],
        "id bigint, cat string, val double",
    )
    got = {r["column"]: r.asDict() for r in profile_table(df).collect()}
    assert set(got) == {"id", "cat", "val"}
    assert got["id"]["n_rows"] == 5 and got["id"]["n_null"] == 0
    assert got["id"]["n_distinct"] == 5
    assert got["cat"]["n_null"] == 1 and got["cat"]["n_distinct"] == 2
    # tie between 'a' (2) and 'b' (2): smallest value wins
    assert got["cat"]["top_value"] == "a" and got["cat"]["top_count"] == 2
    assert got["val"]["n_null"] == 2 and got["val"]["n_distinct"] == 1
    assert got["val"]["top_value"] == "1.5" and got["val"]["top_count"] == 3


def test_profile_all_null_column(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "id bigint, x string"
    )
    got = {r["column"]: r.asDict() for r in profile_table(df).collect()}
    assert got["x"]["n_null"] == 2
    assert got["x"]["n_distinct"] == 0
    assert got["x"]["top_value"] is None and got["x"]["top_count"] is None


def test_profile_scans_corpus_once(spark, tmp_path, docs):
    p = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(p)
    prof = profile_table(
        spark.read.parquet(p), ["lang", "source", "n_chars"]
    )
    prof.collect()
    # the frequency table is materialized ONCE at construction; the final
    # plan's three consumers all read the checkpointed blocks, so the
    # corpus parquet never appears (zero re-scans). Before the fix this
    # plan held 5 FileScans of the corpus.
    plan = _plan(prof)
    assert plan.count("FileScan parquet") == 0, plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan, plan


def test_profile_validation(spark, docs):
    with pytest.raises(ValueError):
        profile_table(docs, [])
    with pytest.raises(ValueError):
        profile_table(docs, ["nope"])
