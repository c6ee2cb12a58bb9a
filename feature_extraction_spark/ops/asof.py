"""Point-in-time (as-of) join — the engine's flagship custom operator (J5).

The reference has no true as-of join (its closest analog is temporal day
bucketing, group_audio_files.py:26-28 + J1); the north_rule makes it
first-class: for every left row (key, ts), attach the most recent right row
with right.ts <= left.ts (or < for strict), optionally within a tolerance.

Two physical strategies, chosen by the caller or by a size/skew heuristic:

1. ``asof_join`` (default, sort-merge shape): union-tag both sides, then
   ``last(value, ignorenulls=True)`` over a window partitioned by key and
   ordered by (ts, side_tag) with an unbounded-preceding frame. Exactly ONE
   shuffle of left+right on the key — the same cost as a sort-merge join —
   and no Python. Right rows sort before left rows at equal ts, giving
   inclusive (<=) semantics; strict mode flips the tag order.

2. ``asof_join_broadcast``: when the right side is small (a dimension
   time-series), collect it per key into a sorted array, broadcast, and
   binary-search-equivalent lookup via array filtering. No shuffle of the
   left side at all — this is also the skew escape hatch: a hot key on the
   left never concentrates on one task because the left side is never
   repartitioned by key.

Zero temporal leakage by construction: the window frame ends at the current
row, and right rows at ts > left.ts can never precede the left row in the
(ts, tag) order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    right_ts_col: str | None = None,
    value_cols: list[str] | None = None,
    inclusive: bool = True,
    tolerance_s: float | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """Sort-merge-shaped as-of join.

    Returns ``left`` with, for each of ``value_cols`` (default: all non-key,
    non-ts right columns), a ``<col><suffix>`` column holding the value from
    the latest right row at-or-before (or strictly before) the left row's ts,
    plus ``<ts_col><suffix>`` with that right row's timestamp.

    ``direction`` (pandas ``merge_asof`` parity, same one-shuffle plan):

    - ``"backward"`` (default): latest right row at-or-before — the
      point-in-time / zero-leakage direction.
    - ``"forward"``: EARLIEST right row at-or-after the left ts
      (``inclusive=False`` -> strictly after). Leaks future values by
      construction — for retrospective analytics (time-to-next-event),
      never for training features.
    - ``"nearest"``: whichever of backward/forward match is closer in
      absolute time; exact ties prefer the backward row. Requires
      ``inclusive=True`` (a strict nearest would need second-place
      candidates once the equal-ts row is discarded, which the single
      window pass cannot express).

    All three directions run in the SAME single key-shuffle window pass —
    ``nearest`` adds a second frame over the identical sort order, not a
    second exchange.

    ``tolerance_s`` bounds the |left.ts - matched right.ts| age in every
    direction; matches outside it are nulled.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if direction == "nearest" and not inclusive:
        raise ValueError("direction='nearest' requires inclusive=True")
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts_col or ts_col
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys + [rts]]

    # Tag order decides tie behavior at equal timestamps. Backward
    # inclusive (<=): right first (tag 0) so the unbounded-preceding frame
    # ending at the left row sees same-ts right rows; strict (<) flips.
    # Forward is the mirror image over the unbounded-FOLLOWING frame:
    # inclusive needs same-ts right rows AFTER the left row, strict before.
    # Nearest keeps the backward-inclusive order: the preceding frame sees
    # the equal-ts row at age 0, which no forward candidate can beat.
    if direction == "forward":
        left_tag, right_tag = (0, 1) if inclusive else (1, 0)
    else:
        left_tag, right_tag = (1, 0) if inclusive else (0, 1)

    lcols = [F.col(c) for c in left.columns]
    l_tagged = left.select(
        *lcols,
        F.col(ts_col).alias("_asof_ts"),
        F.lit(left_tag).alias("_tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[rts].dataType).alias("_r_ts"),
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
        F.col(rts).alias("_asof_ts"),
        F.lit(right_tag).alias("_tag"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(rts).alias("_r_ts"),
    ).select(*l_tagged.columns)  # align column order

    unioned = l_tagged.unionByName(r_tagged)
    ordered = Window.partitionBy(*keys).orderBy("_asof_ts", "_tag")
    wb = ordered.rowsBetween(Window.unboundedPreceding, 0)
    wf = ordered.rowsBetween(0, Window.unboundedFollowing)

    def _bwd(c):
        return F.last(c, ignorenulls=True).over(wb)

    def _fwd(c):
        return F.first(c, ignorenulls=True).over(wf)

    if direction == "backward":
        picks = [_bwd(f"_r_{c}").alias(f"{c}{suffix}") for c in value_cols]
        picks.append(_bwd("_r_ts").alias(f"{ts_col}{suffix}"))
    elif direction == "forward":
        picks = [_fwd(f"_r_{c}").alias(f"{c}{suffix}") for c in value_cols]
        picks.append(_fwd("_r_ts").alias(f"{ts_col}{suffix}"))
    else:  # nearest: both frames over the one sort, closest age wins
        lts_us = F.unix_micros(F.col("_asof_ts"))
        b_ts, f_ts = _bwd("_r_ts"), _fwd("_r_ts")
        use_b = f_ts.isNull() | (
            b_ts.isNotNull()
            & ((lts_us - F.unix_micros(b_ts)) <= (F.unix_micros(f_ts) - lts_us))
        )
        picks = [
            F.when(use_b, _bwd(f"_r_{c}")).otherwise(_fwd(f"_r_{c}")).alias(
                f"{c}{suffix}"
            )
            for c in value_cols
        ]
        picks.append(F.when(use_b, b_ts).otherwise(f_ts).alias(f"{ts_col}{suffix}"))

    filled = unioned.select(
        *[c for c in left.columns],
        F.col("_tag"),
        *picks,
    )
    out = filled.filter(F.col("_tag") == left_tag).drop("_tag")

    if tolerance_s is not None:
        # |age| covers every direction (backward matches are never later,
        # forward never earlier, nearest either side)
        age = (
            F.abs(
                F.unix_micros(F.col(ts_col))
                - F.unix_micros(F.col(f"{ts_col}{suffix}"))
            )
        ) / F.lit(1_000_000.0)
        stale = F.col(f"{ts_col}{suffix}").isNull() | (age > tolerance_s)
        for c in value_cols:
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(stale, F.lit(None)).otherwise(F.col(f"{c}{suffix}")),
            )
        out = out.withColumn(
            f"{ts_col}{suffix}",
            F.when(stale, F.lit(None)).otherwise(F.col(f"{ts_col}{suffix}")),
        )
    return out


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    right_ts_col: str | None = None,
    value_cols: list[str] | None = None,
    inclusive: bool = True,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """Broadcast as-of join for small right sides / skewed left keys.

    Aggregates the right side to one sorted array of (ts, values) per key
    (small by assumption), broadcasts it, and per left row selects the last
    array element at-or-before ts with JVM array expressions.

    ``direction`` matches :func:`asof_join`: ``backward`` (default) takes
    the last element at-or-before, ``forward`` the first at-or-after,
    ``nearest`` (``inclusive=True`` only) the closer of the two with ties
    preferring backward.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if direction == "nearest" and not inclusive:
        raise ValueError("direction='nearest' requires inclusive=True")
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts_col or ts_col
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys + [rts]]

    packed = right.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(rts).alias("_ts"), *[F.col(c) for c in value_cols]))
        ).alias("_series")
    )
    joined = left.join(F.broadcast(packed), on=keys, how="left")
    lts = F.unix_micros(F.col(ts_col))
    before = (
        (lambda e: F.unix_micros(e["_ts"]) <= lts)
        if inclusive
        else (lambda e: F.unix_micros(e["_ts"]) < lts)
    )
    after = (
        (lambda e: F.unix_micros(e["_ts"]) >= lts)
        if inclusive
        else (lambda e: F.unix_micros(e["_ts"]) > lts)
    )
    # try_element_at: the filtered series is EMPTY when a left row precedes
    # (resp. follows) every right row for its key — plain element_at would
    # throw under Spark 4's default ANSI mode instead of yielding NULL
    b_match = F.try_element_at(F.filter(F.col("_series"), before), F.lit(-1))
    f_match = F.try_element_at(F.filter(F.col("_series"), after), F.lit(1))
    if direction == "backward":
        match = b_match
    elif direction == "forward":
        match = f_match
    else:
        use_b = f_match.isNull() | (
            b_match.isNotNull()
            & (
                (lts - F.unix_micros(b_match["_ts"]))
                <= (F.unix_micros(f_match["_ts"]) - lts)
            )
        )
        match = F.when(use_b, b_match).otherwise(f_match)
    out = joined
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", match[c])
    out = out.withColumn(f"{ts_col}{suffix}", match["_ts"]).drop("_series")
    return out


def _estimated_rows(df: DataFrame) -> int | None:
    """Plan-side row estimate — NO Spark job: the optimized plan's CBO
    rowCount when available, else sizeInBytes / schema default row width
    (both maintained by Catalyst from file statistics). Returns None when
    plan statistics are unreachable (e.g. Spark Connect)."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        rc = stats.rowCount()
        if rc.isDefined():
            return int(str(rc.get()))
        size = int(str(stats.sizeInBytes()))
        width = max(1, int(df._jdf.schema().defaultSize()))
        return size // width
    except Exception:
        return None


def asof_join_auto(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    broadcast_threshold_rows: int = 1_000_000,
    right_rows: int | None = None,
    **kwargs,
) -> DataFrame:
    """Strategy-picking as-of join (SURVEY.md §2.3 J5: "broadcast fallback
    for skewed conv_ids / small right sides").

    The right-side size comes from (in order): the caller's ``right_rows``
    (table statistics the deployment already has), the optimized plan's
    Catalyst statistics (no job), and only as a last resort a bounded
    ``limit(n+1).count()`` probe (the scan stops at the limit, so it costs
    O(threshold) rows). At or below the threshold the right side packs
    into per-key sorted arrays and broadcasts (no shuffle of the fact side,
    immune to left-key skew); above it, the union-tag sort-merge shape
    shuffles both sides once by key."""
    thr = broadcast_threshold_rows
    n = right_rows if right_rows is not None else _estimated_rows(right)
    if n is None:
        n = right.limit(thr + 1).count()
    # the broadcast variant has no tolerance path; a requested tolerance
    # routes through the sort-merge shape regardless of size
    if n <= thr and kwargs.get("tolerance_s") is None:
        kwargs.pop("tolerance_s", None)
        return asof_join_broadcast(left, right, on, **kwargs)
    return asof_join(left, right, on, **kwargs)
