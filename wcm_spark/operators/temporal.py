"""Temporal joins Spark lacks natively: as-of join and bounded range join.

Both are staples of event/feature pipelines (point-in-time feature
lookup, "what happened in the window before X") and neither has a
first-class Spark operator. A naive SQL formulation plans as a
BroadcastNestedLoopJoin (inequality-only condition) — the exact
anti-pattern at scale. These implementations keep every join bounded:

* ``asof_join`` — NO join at all: union both sides, one window pass per
  partition key carrying the last-seen right ROW forward (one struct
  column, so the match is atomic — never a per-column mix of two right
  rows). This is the merge-join formulation every columnar engine uses
  for ASOF, expressed as a Spark window so Catalyst/Tungsten run it
  whole-stage.
* ``range_join`` — time-bucketed equi-join: bucket width = the range
  span, the right side duplicated into the (exactly two) buckets whose
  left rows could match it, then an ordinary equi-join on (by, bucket)
  with the exact range predicate as a residual filter. The plan is a
  shuffled equi-join, never a nested loop.

Timestamp arithmetic is integer microseconds end-to-end (timestampdiff
/ unix_micros); no epoch-seconds doubles, so boundary comparisons are
exact for any representable timestamp. Numeric (double) time axes are
supported with ordinary float semantics.

100 TB notes: both shuffle once on the partition key. As-of semantics
are inherently sequential per key, so a single pathological key
serializes within its window — if one key carries a large fraction of
all rows, pre-aggregate the right side per (key, coarse time bucket)
first. The range join's skew is the ordinary equi-join kind: AQE skew
splitting applies as-is because the residual predicate lives on the
join, not in a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _epoch_us(df: DataFrame, col: str) -> Column:
    """Integer epoch microseconds for TIMESTAMP / TIMESTAMP_NTZ columns
    (exact); numeric columns are treated as seconds and scaled (double —
    ordinary float semantics). unix_micros() rejects NTZ, so NTZ goes
    through an integer timestampdiff from the NTZ epoch."""
    dt = dict(df.dtypes)[col]
    if dt == "timestamp_ntz":
        return F.expr(f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, `{col}`)")
    if dt.startswith("timestamp"):
        return F.unix_micros(F.col(col))
    return F.col(col).cast("double") * F.lit(1e6)


def _age_us(df: DataFrame, newer: str, older: str) -> Column:
    """newer - older in microseconds; exact integers for timestamps."""
    dt = dict(df.dtypes)[newer]
    if dt.startswith("timestamp"):
        return F.expr(f"timestampdiff(MICROSECOND, {older}, `{newer}`)")
    return (F.col(newer).cast("double") - F.col(older).cast("double")) * F.lit(1e6)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    on: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_sec: float | None = None,
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, the nearest right row within the
    same ``by`` group — ``direction="backward"`` (default) takes the most
    recent right row with ``right.on <= left.on``, ``"forward"`` the
    earliest with ``right.on >= left.on`` (both inclusive).

    Returns the left rows with ``right_cols`` appended (null when no
    prior right row exists, or when the match is older than
    ``tolerance_sec``). The match is ATOMIC: all appended columns come
    from one right row. Ties on ``on`` among right rows resolve to the
    greatest ``tiebreak`` value (required when right timestamps can
    collide — without it the winner among equal timestamps is
    plan-dependent). Right rows with a null ``on`` can never satisfy an
    as-of predicate and are dropped up front; left rows with a null
    ``on`` come back unmatched.

    Implementation: tag and union the two sides, sort each ``by`` group
    by (on, side) with right rows first at equal timestamps, and carry
    the whole right row forward as one struct with
    ``last(..., ignorenulls=True)`` over an unbounded-preceding window.
    No join node appears in the plan.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join direction must be backward|forward, got {direction!r}")
    back = direction == "backward"
    right_cols = right_cols or [
        c for c in right.columns if c not in by and c != on
    ]
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join output name collision {sorted(clash)}: alias the "
            "right side's value columns before joining"
        )
    right = right.filter(F.col(on).isNotNull())
    # the tiebreak column must ride along in the union even when the
    # caller doesn't want it in the output
    carry = list(right_cols)
    if tiebreak is not None and tiebreak not in carry:
        carry.append(tiebreak)
    reserved = {"__side", "__m", "__r_on"} | {f"__r_{c}" for c in carry}
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join internal name collision {sorted(clash)}: rename "
            "these left-side columns before joining"
        )
    # sort so the winning right row is the LAST non-null struct seen
    # scanning toward each left row: time ascending for backward,
    # descending for forward; right rows first at equal timestamps
    # (inclusive match); greatest tiebreak wins in both directions.
    # Null-`on` left rows must sort BEFORE every right row in scan order
    # so they see no struct and come back unmatched — asc() already puts
    # nulls first, desc() defaults to nulls LAST and would hand them the
    # group's earliest right row.
    order = [
        F.col(on).asc() if back else F.col(on).desc_nulls_first(),
        F.col("__side").asc(),
    ]
    if tiebreak is not None:
        order.append(F.col(f"__r_{tiebreak}").asc_nulls_first())

    l_tag = left.select(
        *by,
        F.col(on).alias(on),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in by and c != on],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in carry
        ],
        F.lit(None).cast(right.schema[on].dataType).alias("__r_on"),
    )
    r_tag = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in by and c != on
        ],
        *[F.col(c).alias(f"__r_{c}") for c in carry],
        F.col(on).alias("__r_on"),
    )
    u = l_tag.unionByName(r_tag)
    # ONE nullable struct per row: non-null only on right rows, so
    # last(ignorenulls) carries complete right rows — a null value field
    # inside the matched row stays null instead of back-filling from an
    # older row (per-column fills produce chimera matches)
    u = u.withColumn(
        "__r_row",
        F.when(
            F.col("__side") == 0,
            F.struct(
                F.col("__r_on").alias("__on"),
                *[F.col(f"__r_{c}").alias(c) for c in right_cols],
            ),
        ),
    )

    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u.select(
        *u.columns,
        F.last("__r_row", ignorenulls=True).over(w).alias("__m"),
    ).filter(F.col("__side") == 1)

    keep: Column | None = None
    if tolerance_sec is not None:
        gap = _age_us(out, on, "__m.__on")
        age = gap if back else -gap
        keep = age <= F.lit(float(tolerance_sec) * 1e6)
    sel = [F.col(c) for c in left.columns]
    for c in right_cols:
        m = F.col(f"__m.{c}")
        sel.append((F.when(keep, m) if keep is not None else m).alias(c))
    return out.select(*sel)


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str = "ts",
    right_on: str = "ts",
    lower_sec: float = 0.0,
    upper_sec: float = 0.0,
    how: str = "left",
) -> DataFrame:
    """Bounded-interval join: pairs (l, r) within the same ``by`` group
    where ``l.left_on + lower_sec <= r.right_on < l.left_on + upper_sec``
    (half-open, so a window "the 10 minutes before" excludes the row's
    own instant with lower=-600, upper=0).

    Right columns come back prefixed ``r_`` (``r_ts``, ``r_value``, ...)
    so self-joins over one events table stay unambiguous. ``how`` is
    ``"left"`` (keep unmatched left rows) or ``"inner"`` — right/full
    outer forms are rejected because the right side is internally
    duplicated, which would emit unmatched right rows twice.

    Implementation: with span = upper - lower, left rows key on
    ``floor((left_on + lower) / span)``; every right row can only match
    left rows whose window-start bucket is ``floor(right_on/span)`` or
    the one before, so the right side is duplicated into exactly those
    two buckets and joined with an ordinary equi-join on (by, bucket),
    the exact range predicate as a residual condition. A right row's two
    bucket copies can never both match one left row (a left row has ONE
    bucket), so no post-join dedup is needed.
    """
    if upper_sec <= lower_sec:
        raise ValueError("range_join needs upper_sec > lower_sec")
    if how not in ("left", "inner"):
        raise ValueError(
            f"range_join supports how='left'|'inner', got {how!r}: the "
            "bucket-duplicated right side would emit unmatched right rows "
            "twice under right/full outer joins"
        )
    clash = {f"r_{c}" for c in right.columns} & set(left.columns)
    clash |= {"__bucket", "__l_epoch", "__bucket_r", "__r_epoch"} & set(
        left.columns
    )
    if clash:
        raise ValueError(
            f"range_join output name collision {sorted(clash)}: rename the "
            "left side's columns before joining"
        )
    lower_us = int(round(lower_sec * 1e6))
    upper_us = int(round(upper_sec * 1e6))
    span_us = upper_us - lower_us

    l_epoch = _epoch_us(left, left_on)
    r_epoch_src = _epoch_us(right, right_on)

    l = left.select(
        *left.columns,
        F.floor((l_epoch + F.lit(lower_us)) / F.lit(span_us)).alias("__bucket"),
        l_epoch.alias("__l_epoch"),
    )
    r = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
        r_epoch_src.alias("__r_epoch"),
    ).withColumn(
        "__bucket_r",
        F.explode(
            F.array(
                F.floor(F.col("__r_epoch") / F.lit(span_us)) - 1,
                F.floor(F.col("__r_epoch") / F.lit(span_us)),
            )
        ),
    )
    cond = F.col("__bucket_r") == F.col("__bucket")
    for k in by:
        cond = cond & (F.col(f"r_{k}") == F.col(k))
    cond = (
        cond
        & (F.col("__r_epoch") >= F.col("__l_epoch") + F.lit(lower_us))
        & (F.col("__r_epoch") < F.col("__l_epoch") + F.lit(upper_us))
    )
    joined = l.join(r, cond, how)
    return joined.drop("__bucket", "__bucket_r", "__l_epoch", "__r_epoch")
