"""Byte-pair-encoding (BPE) subword tokenizer: distributed training and
application (Sennrich, Haddow & Birch, ACL 2016 — the word-level merge
algorithm used by the GPT-2/RoBERTa tokenizer family).

Scale design — the classic trick, made relational:

- The CORPUS is touched exactly once: one exploded word-count aggregation.
  Every merge iteration afterwards runs on the WORD-VOCABULARY table
  (|distinct words| rows — thousands to low millions, independent of
  corpus size), never on the corpus. This is why BPE training is feasible
  at 100 TB: the state the loop mutates is dimension-sized.
- Each merge = one tiny aggregation over exploded symbol pairs (weighted
  by word count) to pick the best pair, plus one native array-aggregate
  pass over the vocab rows to apply it (left-to-right non-overlapping —
  the accumulator form below reproduces the sequential semantics exactly).
  The vocab table's lineage is truncated every iteration (localCheckpoint
  or, with ``checkpoint_dir``, snapshot-table commits a la
  sources/snapshots.py) so 200 merges don't build a 200-deep HOF plan.
- Applying the tokenizer to a corpus is a broadcast/shuffle equi-join of
  exploded words against the final word->segmentation table — no per-row
  Python, no merge loop at apply time. Out-of-vocabulary words fall back
  to character segmentation (counted, visible — not silently dropped).

Determinism: ties in pair counts break lexicographically on (left,
right), so the learned merge sequence is a pure function of the corpus —
asserted against a pure-Python reference implementation in
tests/test_bpe.py. Iterative training is not SQL-expressible; the driver
query is rows-only by design with pytest value parity (same contract as
LDA / the learned quality model).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feature_extraction_spark.ops.lm import _doc_words
from feature_extraction_spark.sources.snapshots import materialize

END = "</w>"


def _char_syms(word: Column) -> Column:
    """word -> [c1, c2, ..., cn, '</w>'] (end-of-word marker carries the
    word boundary through merges, per the published algorithm)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substring(word, i, 1),
    )
    return F.concat(chars, F.array(F.lit(END)))


def _adjacent_pairs(syms: Column) -> Column:
    n = F.size(syms)
    return F.zip_with(
        F.slice(syms, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(syms, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Replace adjacent (a, b) with a+b, left-to-right non-overlapping:
    the accumulator looks back one symbol, so 'aaa' under merge (a,a)
    becomes [aa, a] exactly like the sequential reference. try_element_at:
    NULL on the empty accumulator (never an ANSI error), and NULL == a is
    false, matching the guard."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(a)) & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) distinct-word counts — the single corpus-scale pass."""
    return (
        _doc_words(df, text_col)
        .select(F.explode("_w").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_pair_count: int = 2,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 4,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn up to ``num_merges`` BPE merges on ``df``'s text column.

    Returns ``(merges, word_seg)``: ``merges`` is the ordered list of
    (left, right, pair_count) actually learned (stops early when the best
    pair's corpus count drops below ``min_pair_count``); ``word_seg`` is
    the final (word, n, syms) vocabulary segmentation — the state
    ``apply_bpe`` joins against, and the artifact to persist.

    The best-pair action is inherently one job per merge (each choice
    depends on the previous merge being applied); the lineage-truncating
    materialization is NOT — merges are chained lazily and the vocab is
    materialized every ``checkpoint_every`` rounds (a k-deep array-
    aggregate over the dimension-sized vocab is cheaper to recompute in
    the next best-pair job than a checkpoint job per round; unbounded
    chaining, though, stacks num_merges HOFs into one unanalyzable plan).
    """
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    vocab = word_counts(df, text_col).withColumn(
        "syms", _char_syms(F.col("word"))
    )
    vocab = materialize(vocab, checkpoint_dir, name="bpe_vocab")
    merges: list[tuple[str, str, int]] = []
    pending = 0
    for _ in range(num_merges):
        best = (
            vocab.select(
                F.col("n"), F.explode(_adjacent_pairs(F.col("syms"))).alias("p")
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.col("c").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < min_pair_count:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        merges.append((a, b, c))
        vocab = vocab.withColumn("syms", _apply_merge(F.col("syms"), a, b))
        pending += 1
        if pending >= checkpoint_every:
            vocab = materialize(vocab, checkpoint_dir, name="bpe_vocab")
            pending = 0
    if pending:
        vocab = materialize(vocab, checkpoint_dir, name="bpe_vocab")
    return merges, vocab


def segment_words(
    words: DataFrame,
    merges: list[tuple[str, str]],
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Build a (word, syms) segmentation table by replaying a FROZEN,
    ordered merge list over ``words`` (any DataFrame with a ``word``
    column; extra columns pass through). This is the apply-side artifact
    builder when the tokenizer was trained elsewhere — no best-pair jobs,
    no corpus scan: one chained array-aggregate pass over the
    dimension-sized word table, materialized once at the end. Identical
    semantics to the training loop's vocab updates (left-to-right
    non-overlapping per merge)."""
    out = words.withColumn("syms", _char_syms(F.col("word")))
    for a, b in merges:
        out = out.withColumn("syms", _apply_merge(F.col("syms"), a, b))
    return materialize(out, checkpoint_dir, name="bpe_seg")


def apply_bpe(
    df: DataFrame,
    word_seg: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Tokenize ``df`` with a trained segmentation table: per id,
    ``n_words``, ``n_bpe_tokens`` (OOV words fall back to character
    segmentation), and ``n_oov_words``. One explode + one equi-join on the
    word — the merge loop never runs at apply time. Empty/NULL docs emit
    0/0/0 (kept, not dropped)."""
    words = _doc_words(df, text_col).select(
        *id_cols, F.explode_outer("_w").alias("word")
    )
    seg = word_seg.select("word", F.size("syms").alias("_k"))
    joined = words.join(seg, on="word", how="left")
    # OOV fallback: chars + </w>; NULL word (empty doc placeholder) -> 0
    tok_len = F.when(F.col("word").isNull(), F.lit(0)).otherwise(
        F.coalesce(F.col("_k"), F.length("word") + F.lit(1))
    )
    oov = F.when(
        F.col("word").isNotNull() & F.col("_k").isNull(), F.lit(1)
    ).otherwise(F.lit(0))
    return joined.groupBy(*id_cols).agg(
        F.sum(F.when(F.col("word").isNotNull(), 1).otherwise(0)).alias(
            "n_words"
        ),
        F.sum(tok_len).alias("n_bpe_tokens"),
        F.sum(oov).alias("n_oov_words"),
    )
