"""Cross-document duplicate-SPAN detection and removal — the ExactSubstr
deduplication of Lee et al. 2022 ("Deduplicating Training Data Makes
Language Models Better", arXiv:2107.06499) re-expressed relationally at
token granularity. Doc-level dedup (ops/dedup.py) removes whole near-copies;
this finds the *shared runs inside otherwise-distinct documents* (boilerplate
headers, license blocks, quoted passages) and can cut them out while keeping
one canonical copy corpus-wide.

Reference analog: none (training-pipeline extension layer; the suffix-array
reference tool is a single-node Rust program — this is the shuffle-bounded
Spark equivalent).

Pinned semantics (mirrored in the DuckDB driver oracle and pytest):

- tokens = whitespace tokens of the ORIGINAL text (case preserved,
  empties dropped); positions are 1-based.
- an L-gram window at position p covers tokens [p, p+L-1]; its identity
  is the LOWERCASED single-space join of its tokens.
- a window is duplicated when its L-gram occurs in >= ``min_docs``
  distinct documents (min_docs=1 degrades to "occurs >= 2 times anywhere",
  catching within-doc repetition too).
- spans = maximal runs of duplicated windows per doc: overlapping or
  adjacent hit windows (next start <= prev start + L) merge; a span at
  [s, e] reports its window count.
- removal drops every token covered by a duplicated window EXCEPT the
  windows of the single canonical occurrence per L-gram — the globally
  smallest (doc, position) pair — so exactly one copy of every duplicated
  phrase survives the corpus. Output text is the single-space join of the
  kept tokens (canonical whitespace, original case); NULL text stays NULL.

Scale design (corpus of N tokens, window L):

- windows are built row-locally (sequence + slice: no self-join, no
  window function) and shuffled as 8-byte xxhash64 keys, never gram
  strings — the duplicate-counting aggregation is map-side combinable and
  moves ~16 bytes per token.
- the window stream feeds TWO consumers (the duplicate count and the hit
  semi-join). An explicit ``repartition("h")`` keeps the duplicate-count
  branch's distinct entirely post-shuffle (one reduce-side pass) instead
  of building a map-side (h, doc_id) dedup hash table over the full
  window stream; measured ~10-20%% faster end-to-end at sf0.1. Catalyst
  prunes different columns under each consumer, so the exchange cannot be
  shared outright (no ReusedExchange) — the alternatives were measured:
  ``localCheckpoint`` is another ~20%% faster here but truncates lineage
  and pins non-replicated blocks (an executor loss fails the whole job at
  cluster scale), and ``persist(DISK_ONLY)`` times the same as the
  repartition while leaking cache into the caller's session (the returned
  frame is lazy, so the function can never safely unpersist). Recompute
  of the row-local window build is the deliberate scale choice.
- the hit set (dup hashes) is usually tiny relative to the corpus; the
  hits join is AQE-broadcastable. Island-merging shuffles only hit
  windows (not the corpus) by doc.
- removal joins each doc to its covered-position set (|hits|*L ints,
  deduped per doc) and rebuilds text row-locally; untouched docs never
  shuffle. A 64-bit gram-hash collision needs ~2^32 distinct L-grams —
  at web scale partition the count by a second independent hash
  (xxhash64 with seed) if that bound is ever approached.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _windows(df: DataFrame, text_col: str, id_col: str, l: int) -> DataFrame:
    """(id, pos, h): every L-token window, built row-locally, hashed."""
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+", -1),
        lambda w: F.length(w) > 0,
    )
    d = df.select(F.col(id_col), toks.alias("_w")).withColumn("_n", F.size("_w"))
    starts = F.when(
        F.col("_n") >= l, F.sequence(F.lit(1), F.col("_n") - (l - 1))
    ).otherwise(F.array().cast("array<int>"))
    wins = F.transform(
        starts,
        lambda p: F.struct(
            p.alias("pos"),
            F.xxhash64(F.lower(F.concat_ws(" ", F.slice("_w", p, l)))).alias("h"),
        ),
    )
    return d.select(id_col, F.explode(wins).alias("s")).select(
        id_col, F.col("s.pos").alias("pos"), F.col("s.h").alias("h")
    )


def _dup_hashes(wins: DataFrame, id_col: str, min_docs: int) -> DataFrame:
    """L-gram hashes meeting the duplication criterion. Pure hash
    aggregation (count / count-distinct) — keeper selection is deliberately
    NOT done here: min(struct(id, pos)) falls back to SortAggregate, which
    would sort the FULL corpus window stream; the caller picks keepers over
    the (tiny) hit set instead."""
    agg = wins.groupBy("h").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count_distinct(id_col).alias("nd"),
    )
    crit = (F.col("nd") >= min_docs) if min_docs > 1 else (F.col("cnt") >= 2)
    return agg.filter(crit).select("h")


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    l: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal duplicated-token spans per document.

    Returns (id_col, span_start, span_end, span_tokens, n_windows), one row
    per maximal run of duplicated L-token windows."""
    wins = _windows(df, text_col, id_col, l).repartition("h")
    dup = _dup_hashes(wins, id_col, min_docs)
    hits = wins.join(dup, on="h", how="leftsemi")
    # gaps-and-islands: same-length intervals sorted by start merge while
    # next start <= prev start + L (overlap or adjacency)
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = hits.withColumn(
        "_new",
        F.when(
            F.col("pos") > F.lag("pos").over(w) + F.lit(l), F.lit(1)
        ).otherwise(F.when(F.lag("pos").over(w).isNull(), F.lit(1)).otherwise(F.lit(0))),
    ).withColumn("_span", F.sum("_new").over(w))
    return (
        islands.groupBy(id_col, "_span")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(l - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .withColumn("span_tokens", F.col("span_end") - F.col("span_start") + 1)
        .select(id_col, "span_start", "span_end", "span_tokens", "n_windows")
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    l: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cut duplicated spans out of every document, keeping ONE canonical
    copy of each duplicated L-gram corpus-wide (the smallest (doc, pos)
    occurrence). All input columns are preserved; ``text_col`` is replaced
    by the single-space join of kept tokens (NULL stays NULL) and
    ``n_removed_tokens`` is appended."""
    wins = _windows(df, text_col, id_col, l).repartition("h")
    dup = _dup_hashes(wins, id_col, min_docs)
    # all-but-the-canonical-occurrence per L-gram: one exchange + sort over
    # the HIT windows only (the corpus stream itself is never sorted)
    kw = Window.partitionBy("h").orderBy(id_col, "pos")
    hits = (
        wins.join(dup, on="h", how="leftsemi")
        .withColumn("_rn", F.row_number().over(kw))
        .filter(F.col("_rn") > 1)
    )
    covered = (
        hits.select(
            id_col, F.explode(F.sequence("pos", F.col("pos") + F.lit(l - 1))).alias("tp")
        )
        .groupBy(id_col)
        .agg(F.collect_set("tp").alias("_cov"))
    )
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+", -1),
        lambda w: F.length(w) > 0,
    )
    out = (
        df.withColumn("_toks", toks)
        .join(covered, on=id_col, how="left")
        .withColumn("_cov", F.coalesce("_cov", F.array().cast("array<int>")))
        .withColumn(
            "_kept",
            F.filter(
                F.transform(
                    "_toks", lambda t, i: F.struct(t.alias("t"), (i + 1).alias("i"))
                ),
                lambda s: ~F.array_contains("_cov", s["i"]),
            ),
        )
        .withColumn(
            "n_removed_tokens", (F.size("_toks") - F.size("_kept")).cast("long")
        )
        .withColumn(
            text_col,
            F.when(
                F.col(text_col).isNull(), F.lit(None).cast("string")
            ).otherwise(F.concat_ws(" ", F.transform("_kept", lambda s: s["t"]))),
        )
    )
    return out.select(*df.columns, "n_removed_tokens")
