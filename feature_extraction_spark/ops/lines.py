"""Line-granular corpus cleaning: cross-corpus line dedup (CCNet / FineWeb
style) and the C4 line+document rules.

The reference has no line-level ops (its unit is the conversation turn,
e.g. text_features/extract_verbosity_stats.py); this family belongs to the
LLM-training-data layer the brief adds on top. Public sources only:

- CCNet (Wenzek et al. 2020) deduplicates normalized paragraphs by hash
  across shards; FineWeb (Penedo et al. 2024) drops lines duplicated
  across the corpus. `line_dedup` keeps the TEXT out of every corpus-
  wide exchange: only (id, line_idx, 16-byte md5) occurrence triples
  ride the hash shuffle, drop decisions come back as a doc-grain
  drop-index table, and the text is rebuilt row-locally from the
  original document — see the function docstring for the exact plan.
- C4 (Raffel et al. 2020 §2.2): keep only lines that end in terminal
  punctuation and have >= `min_words_per_line` words; drop any line
  mentioning "javascript"; drop pages containing "lorem ipsum", "{", or a
  bad word; require >= `min_lines` retained lines (the paper counts >= 3
  sentences — every retained line ends in terminal punctuation, so
  retained-line count is the deterministic proxy; documented deviation).
  `c4_filters` is pure column algebra (higher-order array functions over
  the split text) — map-only, zero shuffles, codegen-friendly.

Scale notes (100 TB): `line_dedup`'s corpus-wide exchanges carry only
(id, line_idx, 16-byte md5) triples — the document text itself shuffles
at most once (the final doc-grain join, and not at all when the
drop-index table broadcasts, the common case since it holds only docs
that LOSE a duplicated line); skewed hashes (boilerplate lines repeated
millions of times) collapse in the map-side partial aggregate.
`c4_filters` is embarrassingly parallel. Both keep every expression
JVM-native.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feature_extraction_spark.functions.text import ws_tokens_expr

#: C4's published page-level rejection triggers (lowercased substrings) and
#: a small stand-in for the public bad-words list (the mechanism — token-set
#: intersection against a broadcast list — is what matters; callers pass
#: the full list).
DEFAULT_BADWORDS = ("fuck", "shit", "porn", "xxx")

_NEWLINE = "\n"


def _norm_line(line: Column) -> Column:
    """CCNet-style line normalization: collapse internal whitespace, trim,
    lowercase. md5 of this string is the dedup key in BOTH engines."""
    return F.lower(F.trim(F.regexp_replace(line, r"\s+", " ")))


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-corpus line deduplication (CCNet paragraph dedup / FineWeb
    line dedup): every non-empty normalized line that occurs in more than
    one place keeps ONLY its first occurrence — "first" is the minimum
    (id, line_idx), the same deterministic min-id winner rule as
    exact_dedup. Lines whose normalization is empty are structural, not
    content, and are always kept.

    Returns one row per input doc: (id, text_dedup, n_lines, n_lines_kept)
    where text_dedup rejoins the surviving ORIGINAL (un-normalized) lines
    in order; a doc whose every line was dropped keeps an empty string.

    Plan (text never rides a corpus-wide exchange): norm-empty lines are
    excluded up front (always kept — they need no flags), the remaining
    occurrences are projected to (id, line_idx, md5) BEFORE any shuffle,
    the per-hash (count, min-winner) aggregate joins back on the md5 key
    (exchange-reusable) to flag LOSING occurrences only, losses collapse
    to a doc-grain drop-index array, and the output text is rebuilt
    row-locally from the original document via an index filter. The only
    join that ever sees text is the final doc-grain join against the
    drop table, which broadcasts whenever it fits (it holds only docs
    that lose a duplicated line).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    occ = (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(text, _NEWLINE, -1)).alias(
                "_line_idx", "_line"
            ),
        )
        .withColumn("_nrm", _norm_line(F.col("_line")))
        .filter(F.length("_nrm") > 0)
        .select("_id", "_line_idx", F.md5("_nrm").alias("_h"))
    )
    stats = occ.groupBy("_h").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min(F.struct("_id", "_line_idx")).alias("_keep"),
    )
    drops = (
        occ.join(stats.filter(F.col("_n") > 1).select("_h", "_keep"), "_h")
        .filter(F.struct("_id", "_line_idx") != F.col("_keep"))
        .groupBy("_id")
        .agg(F.collect_set("_line_idx").alias("_drop"))
    )
    doc = df.select(
        F.col(id_col).alias("_id"),
        F.split(text, _NEWLINE, -1).alias("_ls"),
    )
    dropped = F.coalesce(F.col("_drop"), F.array().cast("array<int>"))
    return doc.join(drops, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.array_join(
            F.filter(
                F.col("_ls"),
                lambda line, i: ~F.array_contains(dropped, i),
            ),
            _NEWLINE,
        ).alias("text_dedup"),
        F.size("_ls").cast("long").alias("n_lines"),
        (F.size("_ls") - F.size(dropped)).cast("long").alias("n_lines_kept"),
    )


def _line_ok(line: Column, min_words: int) -> Column:
    t = F.trim(line)
    return (
        F.substring(t, -1, 1).isin(".", "!", "?", '"')
        & (F.size(ws_tokens_expr(t)) >= min_words)
        & ~F.contains(F.lower(t), F.lit("javascript"))
    )


def c4_filters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_lines: int = 3,
    badwords: tuple[str, ...] = DEFAULT_BADWORDS,
) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020 §2.2) as one map-only
    projection. Line rule: keep lines that end in terminal punctuation
    ('.', '!', '?', '"'), have >= min_words_per_line whitespace words, and
    don't mention "javascript". Page rule: `kept` is false when the page
    contains "lorem ipsum" (lowercased), a '{', any bad word as a
    lowercased whitespace token, or fewer than `min_lines` retained lines.

    Returns (id, kept, n_lines_kept, text_c4) for every input doc — the
    caller filters on `kept`; text_c4 always carries the retained lines so
    the rejection reason stays inspectable.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(text, _NEWLINE, -1)
    kept_lines = F.filter(lines, lambda l: _line_ok(l, min_words_per_line))
    toks = ws_tokens_expr(F.lower(text))
    bad = (
        F.arrays_overlap(toks, F.array(*[F.lit(w) for w in badwords]))
        if badwords
        else F.lit(False)
    )
    page_ok = (
        ~F.contains(F.lower(text), F.lit("lorem ipsum"))
        & ~F.contains(text, F.lit("{"))
        & ~bad
        & (F.size(kept_lines) >= min_lines)
    )
    return df.select(
        F.col(id_col),
        page_ok.alias("kept"),
        F.size(kept_lines).cast("long").alias("n_lines_kept"),
        F.array_join(kept_lines, _NEWLINE).alias("text_c4"),
    )
