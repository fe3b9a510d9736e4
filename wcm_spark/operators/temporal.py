"""Temporal joins Spark lacks natively: as-of join and bounded range join.

Both are staples of event/feature pipelines (point-in-time feature
lookup, "what happened in the window before X") and neither has a
first-class Spark operator. A naive SQL formulation plans as a
BroadcastNestedLoopJoin (inequality-only condition) — the exact
anti-pattern at scale. These implementations keep every join bounded:

* ``asof_join`` — NO join at all: union both sides, one window pass per
  partition key carrying the last-seen right row forward. One shuffle
  (the window exchange on ``by``), one sort. This is the merge-join
  formulation every columnar engine uses for ASOF, expressed as a
  Spark window so Catalyst/Tungsten run it whole-stage.
* ``range_join`` — time-bucketed equi-join: bucket width = the range
  span, the right side duplicated into the (at most two) buckets whose
  left rows could match it, then an ordinary equi-join on
  (by, bucket) with the exact range predicate as a residual filter.
  Duplication factor is bounded by ``ceil(span/width) + 1`` (2 with the
  default width=span); the plan is a shuffled equi-join, never a
  nested loop.

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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    on: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_sec: float | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, the most recent right row
    with ``right.on <= left.on`` within the same ``by`` group (inclusive).

    Returns the left rows with ``right_cols`` appended (null when no
    prior right row exists, or when the match is older than
    ``tolerance_sec``). Ties on ``on`` among right rows resolve to the
    greatest ``tiebreak`` value (required when right timestamps can
    collide — without it the winner among equal timestamps is
    plan-dependent).

    Implementation: tag and union the two sides, sort each ``by`` group
    by (on, side) with right rows first at equal timestamps, and carry
    right values forward with ``last(..., ignorenulls=True)`` over an
    unbounded-preceding window. No join node appears in the plan.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in by and c != on
    ]
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join output name collision {sorted(clash)}: alias the "
            "right side's value columns before joining"
        )
    # the tiebreak column must ride along in the union even when the
    # caller doesn't want it in the output
    carry = list(right_cols)
    if tiebreak is not None and tiebreak not in carry:
        carry.append(tiebreak)
    order = [F.col(on).asc(), F.col("__side").asc()]
    if tiebreak is not None:
        order.append(F.col(f"__r_{tiebreak}").asc_nulls_first())

    l_tag = left.select(
        *by,
        F.col(on).alias(on),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in by and c != on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in carry],
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

    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *u.columns,
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in right_cols
        ],
        F.last("__r_on", ignorenulls=True).over(w).alias("__m_on"),
    )
    out = filled.filter(F.col("__side") == 1)

    keep: Column | None = None
    if tolerance_sec is not None:
        age = _epoch_sec(out, on) - _epoch_sec(out, "__m_on")
        keep = age <= F.lit(float(tolerance_sec))
    sel = [F.col(c) for c in left.columns]
    for c in right_cols:
        m = F.col(f"__m_{c}")
        sel.append((F.when(keep, m) if keep is not None else m).alias(c))
    return out.select(*sel)


def _epoch_sec(df: DataFrame, col: str) -> Column:
    """Exact epoch seconds (microsecond-resolution double) for TIMESTAMP,
    TIMESTAMP_NTZ, or numeric columns. unix_micros() rejects NTZ and
    CAST(ntz AS DOUBLE) is unsupported, so NTZ goes through an integer
    timestampdiff from the NTZ epoch — exact, no zone math."""
    dt = dict(df.dtypes)[col]
    if dt == "timestamp_ntz":
        return (
            F.expr(
                f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col}`)"
            )
            / 1e6
        )
    if dt.startswith("timestamp"):
        return F.unix_micros(F.col(col)) / 1e6
    return F.col(col).cast("double")


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
    so self-joins over one events table stay unambiguous.

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
    span = float(upper_sec - lower_sec)

    l_epoch = _epoch_sec(left, left_on)
    r_epoch_src = _epoch_sec(right, right_on)

    l = left.select(
        *left.columns,
        F.floor((l_epoch + F.lit(float(lower_sec))) / F.lit(span)).alias("__bucket"),
        l_epoch.alias("__l_epoch"),
    )
    r = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
        r_epoch_src.alias("__r_epoch"),
    ).withColumn(
        "__bucket",
        F.explode(
            F.array(
                F.floor(F.col("__r_epoch") / F.lit(span)) - 1,
                F.floor(F.col("__r_epoch") / F.lit(span)),
            )
        ),
    )
    cond = F.col("__bucket_r") == F.col("__bucket")
    r = r.withColumnRenamed("__bucket", "__bucket_r")
    for k in by:
        cond = cond & (F.col(f"r_{k}") == F.col(k))
    cond = (
        cond
        & (F.col("__r_epoch") >= F.col("__l_epoch") + F.lit(float(lower_sec)))
        & (F.col("__r_epoch") < F.col("__l_epoch") + F.lit(float(upper_sec)))
    )
    joined = l.join(r, cond, how)
    drop = ["__bucket", "__bucket_r", "__l_epoch", "__r_epoch"]
    return joined.drop(*drop)
