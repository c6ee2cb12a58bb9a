"""Deterministic synthetic transcripts generator.

Pure function of (seed, row index) — no wall clock, no unseeded RNG — so the
same call is byte-identical across runs and across parallelism levels
(local[8] vs local[32]). Generated distributively via ``spark.range`` +
hash-derived columns; the only shuffle is the per-conversation cumulative-gap
window that produces strictly increasing ``ts``.

Fixture requirements covered (FIXTURES.md §1): Zipf-like long-tail
conversation sizes (skew), single-turn conversations, empty-text turns,
double spaces, non-verbal tokens, apostrophes/punctuation, mixed-case turns,
tool turns, sub-second and super-threshold gaps (sessionization), duplicate
ts with differing turn_idx.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Small vocabulary exercising every text-kernel edge case:
# words >6 chars (lw_count), repeats (MATTR/Honoré), apostrophes and
# punctuation (regex strip), mixed case (truecase path), non-verbal tokens.
_VOCAB = [
    "the", "a", "and", "to", "of", "in", "it", "you", "that", "was",
    "yeah", "okay", "right", "know", "like", "think", "going", "really",
    "something", "anything", "because", "probably", "different",
    "conversation", "understand", "interesting", "remember",
    "don't", "can't", "it's", "I'm", "we're",
    "Hello", "Monday", "Spark", "Tuesday",
    "[noise]", "[laughter]", "<unk>",
    "um", "uh", "well", "so", "but", "just", "very", "good", "time",
    "people", "work,", "done.", "why?",
]

_ROLES = ["user", "assistant", "tool", "system"]
_TOOLS = ["search", "python", "browser", "calculator"]


def _u(seed: int, salt: str, *cols) -> F.Column:
    """Deterministic uniform in [0,1) from hashed inputs."""
    h = F.xxhash64(F.lit(seed), F.lit(salt), *cols)
    return (F.pmod(h, F.lit(1_000_000)).cast("double")) / 1_000_000.0


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    zipf_alpha: float = 1.2,
    max_turns: int = 2000,
    mean_words: int = 12,
    session_gap_s: float = 300.0,
    partitions: int | None = None,
) -> DataFrame:
    """Build the canonical transcripts DataFrame
    (conv_id, turn_idx, role, text, tool, ts).

    Conversation sizes follow a truncated Pareto (Zipf-like long tail): a few
    conversations get up to ``max_turns`` turns while the median stays small —
    the skew shape the engine must survive (SURVEY.md §4.3).
    """
    conv = spark.range(0, n_convs, 1, partitions or spark.sparkContext.defaultParallelism)
    u_sz = _u(seed, "size", F.col("id"))
    # Truncated Pareto: n = ceil((1-u)^(-1/alpha)) clamped to [1, max_turns].
    n_turns = F.least(
        F.lit(max_turns),
        F.ceil(F.pow(F.lit(1.0) - u_sz, F.lit(-1.0 / zipf_alpha))).cast("int"),
    )
    conv = conv.select(
        F.format_string("conv_%06d", F.col("id")).alias("conv_id"),
        F.col("id").alias("conv_n"),
        n_turns.alias("n_turns"),
    )

    turns = conv.select(
        "conv_id",
        "conv_n",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    # role: cycles with hash noise over the 4 roles.
    u_role = _u(seed, "role", F.col("conv_id"), F.col("turn_idx"))
    role_idx = F.pmod(
        F.col("turn_idx") + F.when(u_role < 0.15, 1).otherwise(0), F.lit(4)
    )
    roles_arr = F.array(*[F.lit(r) for r in _ROLES])
    role = F.element_at(roles_arr, role_idx.cast("int") + 1)

    # text: 0..(2*mean_words) tokens from the vocabulary; ~2% empty turns.
    u_nw = _u(seed, "nwords", F.col("conv_id"), F.col("turn_idx"))
    n_words = F.when(u_nw < 0.02, F.lit(0)).otherwise(
        (u_nw * (2 * mean_words)).cast("int") + 1
    )
    vocab_arr = F.array(*[F.lit(w) for w in _VOCAB])
    nvocab = len(_VOCAB)
    word_at = lambda j: F.element_at(  # noqa: E731
        vocab_arr,
        (
            F.pmod(
                F.xxhash64(F.lit(seed), F.lit("w"), F.col("conv_id"), F.col("turn_idx"), j),
                F.lit(nvocab),
            )
        ).cast("int")
        + 1,
    )
    words = F.transform(
        F.sequence(F.lit(1), n_words), lambda j: word_at(j)
    )
    # ~1% of tokens become '' -> double spaces after concat_ws (tokenizer edge)
    words = F.transform(
        words,
        lambda w: F.when(
            _u(seed, "gap_tok", F.col("conv_id"), F.col("turn_idx"), w) < 0.01, F.lit("")
        ).otherwise(w),
    )
    text = F.when(n_words == 0, F.lit("")).otherwise(F.concat_ws(" ", words))

    # tool: only for tool-role turns.
    tools_arr = F.array(*[F.lit(t) for t in _TOOLS])
    u_tool = F.pmod(
        F.xxhash64(F.lit(seed), F.lit("tool"), F.col("conv_id"), F.col("turn_idx")),
        F.lit(len(_TOOLS)),
    ).cast("int")
    tool = F.when(role == "tool", F.element_at(tools_arr, u_tool + 1)).otherwise(
        F.lit(None).cast("string")
    )

    # inter-turn gap (ms): 88% sub-5s, 10% medium, 2% above session threshold;
    # 1% exact-zero gaps (duplicate ts, ordering tiebreak test).
    u_gap = _u(seed, "gapms", F.col("conv_id"), F.col("turn_idx"))
    gap_ms = (
        F.when(u_gap < 0.01, F.lit(0.0))
        .when(u_gap < 0.89, 200.0 + u_gap * 5000.0)
        .when(u_gap < 0.98, 5000.0 + u_gap * 60000.0)
        .otherwise(F.lit(session_gap_s * 1000.0 * 2) + u_gap * 1e6)
    )
    gap_ms = F.when(F.col("turn_idx") == 0, F.lit(0.0)).otherwise(gap_ms)

    turns = turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        "conv_n",
        gap_ms.alias("gap_ms"),
    )

    # ts = conv epoch + cumulative gaps (strictly increasing up to the
    # deliberate zero-gap duplicates). One window shuffle, partitioned by conv.
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    epoch_s = 1_700_000_000 + (F.col("conv_n") % 10_000) * 7_200
    cum_ms = F.sum("gap_ms").over(w)
    ts = F.timestamp_millis((epoch_s.cast("long") * 1000 + cum_ms.cast("long")))

    return turns.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        ts.alias("ts"),
    )


def write_transcripts(
    spark: SparkSession,
    path: str,
    n_convs: int,
    seed: int = 42,
    **kwargs,
) -> None:
    """Materialize the synthetic table to parquet, bucket-partition-friendly."""
    df = synth_transcripts(spark, n_convs=n_convs, seed=seed, **kwargs)
    df.write.mode("overwrite").parquet(path)
