"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact top-k against one query vector — the
  baseline. Dot products via zip_with/aggregate (JVM, codegen), global top-k
  via orderBy+limit (Spark runs TakeOrdered, no full sort materialization).
- lsh_topk: random-hyperplane LSH bucketing (deterministic seeded planes) —
  the scale path: candidates = rows sharing the query's bucket in >=1 of
  ``tables`` hash tables, re-ranked exactly. At 100 TB this turns a full
  scan into a bucket-pruned scan (bucket column is derivable at write time
  and partition-prunable).
- knn_join_exact: small-query-set exact kNN via broadcast of the queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k rows by cosine similarity to ``query``."""
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = df.select(
        F.col(id_col),
        cosine_expr(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def hyperplane_sign_expr(vec: Column, plane_idx: int, dim: int, seed: int) -> Column:
    """Sign bit of <vec, h_p> for a deterministic pseudo-random hyperplane:
    h_p[i] = uniform(-1,1) from xxhash64(seed, p, i)."""
    comps = F.zip_with(
        vec,
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda v, i: v
        * (
            (
                F.pmod(F.xxhash64(F.lit(seed), F.lit(plane_idx), i), F.lit(2_000_000))
                .cast("double")
                / 1_000_000.0
            )
            - 1.0
        ),
    )
    s = F.aggregate(comps, F.lit(0.0), lambda acc, v: acc + v)
    return (s > 0).cast("int")


def lsh_bucket_expr(vec: Column, dim: int, planes: int, table: int, seed: int) -> Column:
    """Bucket id = packed sign bits of ``planes`` hyperplanes (per table)."""
    bits = [
        hyperplane_sign_expr(vec, table * 1000 + p, dim, seed) for p in range(planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = F.shiftleft(out, 1).bitwiseOR(b)
    return out


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """LSH top-k with the query's buckets computed inside Spark (exact same
    hash as the data side — no Python xxhash reimplementation)."""
    dim = len(query)
    vec = F.col(vec_col).cast("array<double>")
    q = F.array(*[F.lit(float(x)) for x in query])

    cond = None
    for t in range(tables):
        data_b = lsh_bucket_expr(vec, dim, planes, t, seed)
        query_b = lsh_bucket_expr(q, dim, planes, t, seed)
        c = data_b == query_b
        cond = c if cond is None else (cond | c)
    cands = df.filter(cond)
    return (
        cands.select(F.col(id_col), cosine_expr(vec, q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def knn_join_exact(
    data: DataFrame,
    queries: DataFrame,
    k: int = 5,
    data_id: str = "vec_id",
    query_id: str = "q_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact kNN join for a SMALL query set: broadcast queries, score every
    (data, query) pair, keep top-k per query via window rank."""
    from pyspark.sql import Window

    d = data.select(F.col(data_id), F.col(vec_col).cast("array<double>").alias("_dv"))
    qdf = queries.select(
        F.col(query_id), F.col(vec_col).cast("array<double>").alias("_qv")
    )
    scored = d.crossJoin(F.broadcast(qdf)).select(
        query_id,
        data_id,
        cosine_expr(F.col("_dv"), F.col("_qv")).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.col(data_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
