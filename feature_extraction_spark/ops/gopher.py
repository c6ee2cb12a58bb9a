"""Gopher-style repetition and document-quality rules for pre-training
corpora (Rae et al. 2021, arXiv:2112.11446, Appendix A "Quality filtering"
and "Repetition removal"; bullet/ellipsis/alpha heuristics also in C4,
Raffel et al. 2020).

Everything is JVM-native: line/paragraph repetition is pure within-row
array algebra (zero shuffle), and n-gram repetition is ONE explode over all
n sizes at once -> one (doc, n, gram) hash aggregation -> one per-(doc, n)
aggregation -> join back on the doc key. At 100 TB that is two map-side-
combinable shuffles of 8-byte-hashable keys plus one co-partitioned join —
no per-document Python, no cross joins, no window over exploded grams.

Exact semantics (mirrored verbatim in the DuckDB driver oracle and the
pandas test oracle — deviations across implementations of "Gopher rules"
exist in public pipelines, so ours are pinned here):

- words = whitespace tokens of lowercased text (shared ws_tokens_expr);
  total_chars = sum of word lengths (spaces excluded).
- duplicate line/paragraph fraction = occurrences beyond the first of any
  repeated line (paragraph) / total lines (paragraphs); the char variant
  weighs by segment length. Lines split on \\n, paragraphs on \\n{2,};
  segments are trimmed, empties dropped.
- top n-gram char fraction (n=2,3,4) = cnt*glen of the most frequent
  n-gram / total_chars, ties broken by larger glen; glen counts word chars
  only (gram length minus its n-1 joiner spaces).
- duplicated n-gram char fraction (n=5..10) = sum of cnt*glen over grams
  with cnt>1 / total_chars. Both n-gram fractions are capped at 1.0
  (n-grams overlap, so the raw numerator can exceed total_chars); the cap
  preserves NaN for empty docs.
- symbol-to-word ratio counts '#' plus literal '...' plus unicode ellipsis.
- a word is alphabetic if it contains any [a-z] after lowering.
- required-stopword hits = how many of {the,be,to,of,and,that,have,with}
  appear at least once.

A rule FAILS when its statistic is NaN (empty doc) or beyond the Gopher
threshold; ``gopher_flags`` lists failed rules and ``gopher_keep`` is
flags == [].
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feature_extraction_spark.functions.text import nan_guard_div, ws_tokens_expr
from feature_extraction_spark.sources.io import ensure_parallelism

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)

REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
BULLET_PREFIXES = ("•", "‣", "◦", "⁃", "-", "*")

# Published Gopher thresholds (arXiv:2112.11446 Table A1).
GOPHER_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.10,
    "max_bullet_line_frac": 0.90,
    "max_ellipsis_line_frac": 0.30,
    "min_alpha_word_frac": 0.80,
    "min_stopword_hits": 2,
}


def _segments(col: Column, pattern: str) -> Column:
    """Split -> strip -> drop empties (shared line/paragraph segmentation).
    Strip is a \\s regex, NOT F.trim — Spark's trim removes spaces only,
    while the pinned semantics (python .strip(), DuckDB oracle) remove all
    whitespace."""
    return F.filter(
        F.transform(
            F.split(col, pattern, -1),
            lambda s: F.regexp_replace(s, r"^\s+|\s+$", ""),
        ),
        lambda s: F.length(s) > 0,
    )


def _char_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + F.length(x))


def _count_matches(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def with_repetition_features(
    df: DataFrame,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
    top_ns: Sequence[int] = TOP_NS,
    dup_ns: Sequence[int] = DUP_NS,
) -> DataFrame:
    """Append the Gopher repetition + lexical statistics to ``df``.

    NULL text is treated as '' so every input row keeps its output row
    (word-based ratios come out NaN, per the NULL-entity convention)."""
    ids = list(id_cols)
    c = F.coalesce(F.col(text_col), F.lit(""))
    words = ws_tokens_expr(F.lower(c))
    # every statistic below is an interpreted HOF over the token array —
    # a single-split scan would serialize all of it onto one task
    base = ensure_parallelism(df).withColumn("_words", words)

    # ---- within-row segment stats (no shuffle). The split->strip->filter
    # segment arrays are materialized as columns so each is evaluated ONCE
    # per row (CollapseProject keeps multiply-referenced non-cheap producer
    # expressions in their own projection); deriving them inline would
    # re-run the regex pipeline for every size/distinct/char-sum use.
    base = base.withColumn("_lines", _segments(c, r"\n")).withColumn(
        "_paras", _segments(c, r"\n{2,}")
    )

    def seg_feats(d: DataFrame, seg_col: str, prefix: str) -> DataFrame:
        segs = F.col(seg_col)
        dsegs = F.array_distinct(segs)
        n = F.size(segs)
        nd = F.size(dsegs)
        ch = _char_sum(segs)
        chd = _char_sum(dsegs)
        return d.withColumn(
            f"dup_{prefix}_frac", nan_guard_div((n - nd).cast("double"), n)
        ).withColumn(
            f"dup_{prefix}_char_frac", nan_guard_div((ch - chd).cast("double"), ch)
        )

    base = seg_feats(base, "_lines", "line")
    base = seg_feats(base, "_paras", "para")

    lines = F.col("_lines")
    n_lines = F.size(lines)

    def _starts_with_any(s: Column) -> Column:
        cond = F.lit(False)
        for p in BULLET_PREFIXES:
            cond = cond | s.startswith(p)
        return cond

    def _ends_with_ellipsis(s: Column) -> Column:
        return s.endswith("...") | s.endswith("…")

    bullet = F.size(F.filter(lines, _starts_with_any))
    ellipsis = F.size(F.filter(lines, _ends_with_ellipsis))

    n_words = F.size(F.col("_words"))
    tot = _char_sum(F.col("_words"))
    symbols = (
        _count_matches(c, r"#") + _count_matches(c, r"\.\.\.") + _count_matches(c, "…")
    )
    alpha = F.size(F.filter(F.col("_words"), lambda w: w.rlike("[a-z]")))
    req = F.array(*[F.lit(w) for w in REQUIRED_STOPWORDS])
    stop_hits = F.size(F.array_intersect(F.array_distinct(F.col("_words")), req))

    base = (
        base.withColumn("gq_n_words", n_words.cast("long"))
        .withColumn("gq_total_chars", tot)
        .withColumn("mean_word_len", nan_guard_div(tot.cast("double"), n_words))
        .withColumn("symbol_word_ratio", nan_guard_div(symbols.cast("double"), n_words))
        .withColumn("bullet_line_frac", nan_guard_div(bullet.cast("double"), n_lines))
        .withColumn("ellipsis_line_frac", nan_guard_div(ellipsis.cast("double"), n_lines))
        .withColumn("alpha_word_frac", nan_guard_div(alpha.cast("double"), n_words))
        .withColumn("stopword_hits", stop_hits.cast("long"))
    )

    # ---- n-gram repetition: one explode over every n at once
    all_ns = sorted(set(top_ns) | set(dup_ns))

    def _gram_maker(n: int):
        # exactly-one-param lambda: a defaulted 2nd param would be parsed
        # as the array index by Spark's HOF machinery
        def mk(i: Column) -> Column:
            return F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(" ", F.slice("_words", i, n)).alias("g"),
            )

        return mk

    per_n_arrays = [
        F.when(
            F.size("_words") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("_words") - F.lit(n - 1)), _gram_maker(n)
            ),
        )
        .otherwise(F.array().cast("array<struct<n:int,g:string>>"))
        for n in all_ns
    ]
    ex = base.select(*ids, F.explode(F.flatten(F.array(*per_n_arrays))).alias("t")).select(
        *ids, F.col("t.n").alias("n"), F.col("t.g").alias("g")
    )
    # Shuffle 8-byte gram hashes, not gram strings: the (doc, n, gram) key
    # only serves to count occurrences, so xxhash64(n, g) carries the gram
    # identity and glen (word chars = len - joiner spaces, identical for a
    # given gram) rides along — same keying trick as the dedup shingle
    # index (ops/dedup.py). Cuts per-row shuffle bytes ~5x at corpus scale;
    # a 64-bit collision would need ~2^32 distinct grams per (doc, n).
    glen = (F.length("g") - (F.col("n") - F.lit(1))).cast("long")
    cnt = (
        ex.select(*ids, "n", F.xxhash64("n", "g").alias("gh"), glen.alias("glen"))
        .groupBy(*ids, "n", "gh")
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("glen").alias("glen"))
    )
    # ONE per-doc aggregation for every n at once (conditional struct-max /
    # conditional sums) — two total exchanges for the n-gram path:
    # by (doc, n, gram-hash), then by doc.
    pivots = []
    for n in top_ns:
        pivots.append(
            F.max(
                F.when(
                    F.col("n") == n,
                    F.struct(F.col("cnt").alias("cnt"), F.col("glen").alias("glen")),
                )
            ).alias(f"_topst{n}")
        )
    for n in dup_ns:
        pivots.append(
            F.sum(
                F.when((F.col("n") == n) & (F.col("cnt") > 1), F.col("cnt") * F.col("glen"))
            ).alias(f"_dup{n}")
        )
    piv = cnt.groupBy(*ids).agg(*pivots)
    for n in top_ns:
        piv = piv.withColumn(
            f"_top{n}", F.col(f"_topst{n}.cnt") * F.col(f"_topst{n}.glen")
        ).drop(f"_topst{n}")

    def _cap1(x: Column) -> Column:
        # least() treats NaN as LARGEST: least(1.0, NaN) == 1.0, silently
        # turning an empty doc into a maximally-repetitive one — keep NaN.
        return F.when(F.isnan(x), x).otherwise(F.least(F.lit(1.0), x))

    # reuse the materialized gq_total_chars column — re-deriving `tot` here
    # would re-evaluate the interpreted array aggregate once per fraction
    tot_col = F.col("gq_total_chars")
    out = base.join(piv, on=ids, how="left")
    for n in top_ns:
        out = out.withColumn(
            f"top_{n}gram_char_frac",
            _cap1(
                nan_guard_div(
                    F.coalesce(F.col(f"_top{n}"), F.lit(0)).cast("double"), tot_col
                )
            ),
        ).drop(f"_top{n}")
    for n in dup_ns:
        out = out.withColumn(
            f"dup_{n}gram_char_frac",
            _cap1(
                nan_guard_div(
                    F.coalesce(F.col(f"_dup{n}"), F.lit(0)).cast("double"), tot_col
                )
            ),
        ).drop(f"_dup{n}")
    return out.drop("_words", "_lines", "_paras")


def _fails(stat: Column, *, above: float | None = None, below: float | None = None) -> Column:
    """A Gopher rule fails on NaN (degenerate doc) or a threshold breach."""
    cond = F.isnan(stat.cast("double"))
    if above is not None:
        cond = cond | (stat > F.lit(above))
    if below is not None:
        cond = cond | (stat < F.lit(below))
    return cond


def with_gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """Repetition features + published-threshold rule evaluation:
    ``gopher_flags`` (array of failed rule names, deterministic order) and
    ``gopher_keep`` (no rule failed)."""
    t = dict(GOPHER_THRESHOLDS)
    if thresholds:
        t.update(thresholds)
    out = with_repetition_features(df, text_col=text_col, id_cols=id_cols)

    rules: list[tuple[str, Column]] = []
    for stat in (
        "dup_line_frac",
        "dup_para_frac",
        "dup_line_char_frac",
        "dup_para_char_frac",
        "top_2gram_char_frac",
        "top_3gram_char_frac",
        "top_4gram_char_frac",
        "dup_5gram_char_frac",
        "dup_6gram_char_frac",
        "dup_7gram_char_frac",
        "dup_8gram_char_frac",
        "dup_9gram_char_frac",
        "dup_10gram_char_frac",
    ):
        rules.append((stat, _fails(F.col(stat), above=t[stat])))
    rules.append(
        (
            "word_count",
            (F.col("gq_n_words") < t["min_words"])
            | (F.col("gq_n_words") > t["max_words"]),
        )
    )
    rules.append(
        (
            "mean_word_len",
            _fails(
                F.col("mean_word_len"),
                above=t["max_mean_word_len"],
                below=t["min_mean_word_len"],
            ),
        )
    )
    rules.append(
        ("symbol_word_ratio", _fails(F.col("symbol_word_ratio"), above=t["max_symbol_word_ratio"]))
    )
    rules.append(
        ("bullet_line_frac", _fails(F.col("bullet_line_frac"), above=t["max_bullet_line_frac"]))
    )
    rules.append(
        (
            "ellipsis_line_frac",
            _fails(F.col("ellipsis_line_frac"), above=t["max_ellipsis_line_frac"]),
        )
    )
    rules.append(
        ("alpha_word_frac", _fails(F.col("alpha_word_frac"), below=t["min_alpha_word_frac"]))
    )
    rules.append(("stopword_hits", F.col("stopword_hits") < t["min_stopword_hits"]))

    flags = F.filter(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in rules]),
        lambda x: x.isNotNull(),
    )
    return out.withColumn("gopher_flags", flags).withColumn(
        "gopher_keep", F.size(flags) == 0
    )


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """The filter form: input columns only, rows that pass every rule."""
    cols = df.columns
    return (
        with_gopher_quality(df, text_col=text_col, id_cols=id_cols, thresholds=thresholds)
        .filter(F.col("gopher_keep"))
        .select(*cols)
    )
