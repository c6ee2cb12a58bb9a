"""Transcript rendering for training-data assembly: flatten multi-turn
conversations into model-ready text with per-turn character offsets and a
loss-mask flag.

This is the step between the transcript table and the tokenizer in an SFT
(supervised fine-tuning) pipeline: each conversation becomes ONE document
("role: text" turns joined by a separator), and each turn knows its
[start_char, end_char) span inside that document plus whether loss should
be computed on it (assistant turns train, user/system/tool turns are
context). The reference has no counterpart (its unit is per-turn feature
rows); public pattern: chat-template flattening in every open SFT stack.

Scale notes (100 TB): `render_turns` is ONE window over the conversation
partitioning — the same (conv_id) exchange every other per-turn feature
op in this engine uses, so it co-schedules with them on a shared shuffle.
`render_conversations` is one groupBy(conv_id). No Python, no UDFs; the
offset arithmetic is a running sum over rendered-turn lengths, exact in
both engines (pure integer algebra), so the op is DuckDB-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _rendered(role_col: str, text_col: str, role_sep: str):
    return F.concat(
        F.coalesce(F.col(role_col), F.lit("")),
        F.lit(role_sep),
        F.coalesce(F.col(text_col), F.lit("")),
    )


def _trainable(role_col: str, trainable_roles: tuple[str, ...]):
    # isin() with zero values is an invalid expression — an empty mask
    # (nothing trains) is a legitimate config, e.g. pure-context corpora
    if not trainable_roles:
        return F.lit(False)
    return F.col(role_col).isin(*trainable_roles)


def render_turns(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("turn_idx",),
    role_col: str = "role",
    text_col: str = "text",
    trainable_roles: tuple[str, ...] = ("assistant",),
    sep: str = "\n",
    role_sep: str = ": ",
) -> DataFrame:
    """Per-turn rendering + exact character offsets into the flattened
    conversation: adds `rendered` ("<role><role_sep><text>"), `start_char`
    / `end_char` ([start, end) in the `sep`-joined document), and
    `trainable` (role in trainable_roles — the loss mask).

    One window over (conv_col, order_cols): start = running sum of
    previous turns' rendered length + len(sep), NULL-frame-safe at the
    first turn.
    """
    r = _rendered(role_col, text_col, role_sep)
    w = (
        Window.partitionBy(conv_col)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df.withColumn("rendered", r).withColumn(
        "start_char",
        F.coalesce(
            F.sum(F.length("rendered") + len(sep)).over(w), F.lit(0)
        ).cast("long"),
    )
    return out.withColumn(
        "end_char", (F.col("start_char") + F.length("rendered")).cast("long")
    ).withColumn("trainable", _trainable(role_col, trainable_roles))


def truncate_conversations(
    df: DataFrame,
    max_chars: int,
    conv_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("turn_idx",),
    role_col: str = "role",
    text_col: str = "text",
    keep: str = "last",
    sep: str = "\n",
    role_sep: str = ": ",
) -> DataFrame:
    """Context-length truncation at WHOLE-TURN granularity: mark the turns
    whose rendered conversation (same "<role><role_sep><text>" + `sep`
    rendering as render_turns) fits inside `max_chars`, keeping the
    `keep`='last' suffix (chat serving / SFT default: recent context wins)
    or the 'first' prefix. A turn is kept iff the flattened length of it
    plus everything retained on its side is <= max_chars — so the kept set
    re-rendered is always <= max_chars and never splits a turn.

    Adds `cum_chars` (flattened length of the candidate suffix/prefix
    ending at this turn) and `kept`. One window over the conv partition —
    same single (conv_col) exchange as render_turns.
    """
    if max_chars < 0:
        raise ValueError("max_chars must be >= 0")
    if keep not in ("last", "first"):
        raise ValueError("keep must be 'last' or 'first'")
    r = _rendered(role_col, text_col, role_sep)
    asc = keep == "first"
    w = (
        Window.partitionBy(conv_col)
        .orderBy(
            *[
                (F.col(c).asc() if asc else F.col(c).desc())
                for c in order_cols
            ]
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df.withColumn("_rlen", F.length(r)).withColumn(
        "cum_chars",
        (
            F.sum(F.col("_rlen") + len(sep)).over(w) - len(sep)
        ).cast("long"),
    )
    return out.withColumn(
        "kept", F.col("cum_chars") <= F.lit(max_chars)
    ).drop("_rlen")


def render_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("turn_idx",),
    role_col: str = "role",
    text_col: str = "text",
    trainable_roles: tuple[str, ...] = ("assistant",),
    sep: str = "\n",
    role_sep: str = ": ",
) -> DataFrame:
    """One row per conversation: `text` (the flattened document — turns
    rendered "<role><role_sep><text>" and joined by `sep` in order),
    `n_turns`, `n_chars` (== len(text)), and `n_trainable_chars` (total
    rendered length of trainable turns — the loss-mask mass a packing
    step budgets by). One groupBy(conv_col) shuffle."""
    r = _rendered(role_col, text_col, role_sep)
    key = F.struct(*[F.col(c) for c in order_cols])
    trainable = _trainable(role_col, trainable_roles)
    return (
        df.select(
            F.col(conv_col),
            key.alias("_k"),
            r.alias("_r"),
            trainable.alias("_t"),
        )
        .groupBy(conv_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_k", "_r"))),
                    lambda s: s["_r"],
                ),
                sep,
            ).alias("text"),
            F.count(F.lit(1)).alias("n_turns"),
            (
                F.sum(F.length("_r"))
                + (F.count(F.lit(1)) - 1) * len(sep)
            ).cast("long").alias("n_chars"),
            F.sum(
                F.when(F.col("_t"), F.length("_r")).otherwise(F.lit(0))
            ).cast("long").alias("n_trainable_chars"),
        )
    )
