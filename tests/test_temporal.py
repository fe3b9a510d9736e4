"""Temporal join operators: as-of join (union+window) and bucketed range
join. Correctness vs a brute-force pandas reference over a fixture with
deliberately nasty geometry (equal timestamps across sides, right ties,
window-boundary hits), plus plan pins: asof has NO join node, range join
never plans a nested loop."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from wcm_spark.operators.temporal import asof_join, range_join

T0 = dt.datetime(2024, 1, 1)


def _ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def frames(spark):
    # left: (key, ts, lid); right: (key, ts, rid, val)
    left_rows = [
        ("a", _ts(10.0), 1),
        ("a", _ts(20.0), 2),
        ("a", _ts(20.000001), 3),  # just past an exact right tie
        ("b", _ts(5.0), 4),  # no prior right row
        ("b", _ts(100.0), 5),
        ("c", _ts(50.0), 6),  # key absent on the right
    ]
    right_rows = [
        ("a", _ts(10.0), 100, 1.0),  # exactly equal to left lid=1 (inclusive)
        ("a", _ts(20.0), 101, 2.0),  # tie pair: same ts, two right rows
        ("a", _ts(20.0), 102, 3.0),
        ("b", _ts(99.0), 103, 4.0),
        ("b", _ts(6.0), 104, 5.0),
    ]
    left = spark.createDataFrame(left_rows, "key string, ts timestamp, lid int")
    right = spark.createDataFrame(
        right_rows, "key string, ts timestamp, rid int, val double"
    )
    return left, right


def _brute_asof(left_rows, right_rows, tolerance=None):
    out = {}
    for k, lts, lid in left_rows:
        best = None
        for rk, rts, rid, val in right_rows:
            if rk != k or lts is None or rts is None or rts > lts:
                continue
            if tolerance is not None and (lts - rts).total_seconds() > tolerance:
                continue
            # tie rule: greatest rid among equal latest ts wins
            if best is None or (rts, rid) > (best[0], best[1]):
                best = (rts, rid, val)
        out[lid] = (best[1], best[2]) if best else (None, None)
    return out


def test_asof_matches_brute_force(frames):
    left, right = frames
    got = {
        r["lid"]: (r["rid"], r["val"])
        for r in asof_join(
            left, right, by=["key"], on="ts", tiebreak="rid"
        ).collect()
    }
    left_rows = [(r["key"], r["ts"], r["lid"]) for r in left.collect()]
    right_rows = [
        (r["key"], r["ts"], r["rid"], r["val"]) for r in right.collect()
    ]
    assert got == _brute_asof(left_rows, right_rows)


def test_asof_tolerance(frames):
    left, right = frames
    got = {
        r["lid"]: (r["rid"], r["val"])
        for r in asof_join(
            left, right, by=["key"], on="ts", tiebreak="rid", tolerance_sec=1.0
        ).collect()
    }
    left_rows = [(r["key"], r["ts"], r["lid"]) for r in left.collect()]
    right_rows = [
        (r["key"], r["ts"], r["rid"], r["val"]) for r in right.collect()
    ]
    assert got == _brute_asof(left_rows, right_rows, tolerance=1.0)
    # lid=5 (ts=100) matched rid=103 (ts=99) exactly at the tolerance edge
    assert got[5] == (103, 4.0)
    # lid=2 (ts=20) keeps its tie-winner; lid=1's match is 0s old
    assert got[2] == (102, 3.0) and got[1] == (100, 1.0)


def test_asof_plan_has_no_join(frames):
    from wcm_spark.plans.inspect import formatted_plan, shuffle_count

    left, right = frames
    plan = formatted_plan(asof_join(left, right, by=["key"], tiebreak="rid"))
    assert "Join" not in plan, plan
    # one exchange for the window partitioning (plus AQE reads)
    assert "Window" in plan


def _brute_range(left_rows, right_rows, lower, upper):
    out = {}
    for k, lts, lid in left_rows:
        n = 0
        for rk, rts, rid, val in right_rows:
            if rk != k or lts is None or rts is None:
                continue
            off = (rts - lts).total_seconds()
            if lower <= off < upper:
                n += 1
        out[lid] = n
    return out


@pytest.mark.parametrize("lower,upper", [(-15.0, 0.0), (0.0, 80.0), (-5.0, 5.0)])
def test_range_join_matches_brute_force(frames, lower, upper):
    left, right = frames
    j = range_join(
        left, right, by=["key"], lower_sec=lower, upper_sec=upper, how="left"
    )
    got = {
        r["lid"]: r["n"]
        for r in j.groupBy("lid").agg(F.count("r_rid").alias("n")).collect()
    }
    left_rows = [(r["key"], r["ts"], r["lid"]) for r in left.collect()]
    right_rows = [
        (r["key"], r["ts"], r["rid"], r["val"]) for r in right.collect()
    ]
    assert got == _brute_range(left_rows, right_rows, lower, upper)


def test_range_join_boundary_semantics(frames):
    """Half-open window: a right row AT the left instant is excluded with
    upper=0, included with lower=0."""
    left, right = frames
    before = range_join(
        left, right, by=["key"], lower_sec=-600.0, upper_sec=0.0
    )
    n1 = {
        r["lid"]: r["n"]
        for r in before.groupBy("lid").agg(F.count("r_rid").alias("n")).collect()
    }
    assert n1[1] == 0  # rid=100 at exactly ts=10 is NOT "before"
    after = range_join(left, right, by=["key"], lower_sec=0.0, upper_sec=600.0)
    n2 = {
        r["lid"]: r["n"]
        for r in after.groupBy("lid").agg(F.count("r_rid").alias("n")).collect()
    }
    assert n2[1] == 3  # rid 100 (equal), 101, 102 within 600s after


def test_range_join_plan_is_equi_join(frames):
    from wcm_spark.plans.inspect import formatted_plan

    left, right = frames
    plan = formatted_plan(
        range_join(left, right, by=["key"], lower_sec=-600.0, upper_sec=0.0)
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the bucket key must be a real equi-join key
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_temporal_fuzz_vs_brute_force(spark, seed):
    """Seeded random geometry — coarse integer-second grid so exact
    timestamp ties (left==right and right==right) occur constantly, the
    case hand fixtures under-sample."""
    import random

    rng = random.Random(seed)
    keys = ["a", "b", "c", "d"]
    # ~10% null timestamps on BOTH sides: null left rows must come back
    # unmatched, null right rows must never match (the forward-direction
    # NULLS LAST regression lived exactly in this blind spot)
    left_rows = [
        (
            rng.choice(keys),
            None if rng.random() < 0.1 else _ts(float(rng.randrange(0, 120))),
            i,
        )
        for i in range(60)
    ]
    right_rows = [
        (
            rng.choice(keys),
            None if rng.random() < 0.1 else _ts(float(rng.randrange(0, 120))),
            100 + i,
            float(i),
        )
        for i in range(80)
    ]
    left = spark.createDataFrame(left_rows, "key string, ts timestamp, lid int")
    right = spark.createDataFrame(
        right_rows, "key string, ts timestamp, rid int, val double"
    )
    got = {
        r["lid"]: (r["rid"], r["val"])
        for r in asof_join(left, right, by=["key"], tiebreak="rid").collect()
    }
    assert got == _brute_asof(left_rows, right_rows)

    j = range_join(left, right, by=["key"], lower_sec=-30.0, upper_sec=0.0)
    got_n = {
        r["lid"]: r["n"]
        for r in j.groupBy("lid").agg(F.count("r_rid").alias("n")).collect()
    }
    assert got_n == _brute_range(left_rows, right_rows, -30.0, 0.0)


def _brute_asof_fwd(left_rows, right_rows, tolerance=None):
    out = {}
    for k, lts, lid in left_rows:
        best = None
        for rk, rts, rid, val in right_rows:
            if rk != k or lts is None or rts is None or rts < lts:
                continue
            if tolerance is not None and (rts - lts).total_seconds() > tolerance:
                continue
            # nearest future ts; greatest rid among equal nearest ts wins
            if best is None or (rts, -rid) < (best[0], -best[1]):
                best = (rts, rid, val)
        out[lid] = (best[1], best[2]) if best else (None, None)
    return out


@pytest.mark.parametrize("seed", [7, 23])
def test_asof_forward_matches_brute_force(spark, seed):
    import random

    rng = random.Random(seed)
    keys = ["a", "b", "c"]
    left_rows = [
        (
            rng.choice(keys),
            None if rng.random() < 0.1 else _ts(float(rng.randrange(0, 60))),
            i,
        )
        for i in range(40)
    ]
    right_rows = [
        (
            rng.choice(keys),
            None if rng.random() < 0.1 else _ts(float(rng.randrange(0, 60))),
            100 + i,
            float(i),
        )
        for i in range(50)
    ]
    left = spark.createDataFrame(left_rows, "key string, ts timestamp, lid int")
    right = spark.createDataFrame(
        right_rows, "key string, ts timestamp, rid int, val double"
    )
    got = {
        r["lid"]: (r["rid"], r["val"])
        for r in asof_join(
            left, right, by=["key"], tiebreak="rid", direction="forward"
        ).collect()
    }
    assert got == _brute_asof_fwd(left_rows, right_rows)
    got_tol = {
        r["lid"]: (r["rid"], r["val"])
        for r in asof_join(
            left, right, by=["key"], tiebreak="rid", direction="forward",
            tolerance_sec=5.0,
        ).collect()
    }
    assert got_tol == _brute_asof_fwd(left_rows, right_rows, tolerance=5.0)


def test_asof_match_is_atomic(spark):
    """The matched right row is carried whole: a NULL value field in the
    winning row must stay NULL, never back-fill from an older row
    (per-column fills produce chimera matches)."""
    left = spark.createDataFrame(
        [("k", _ts(25.0), 1)], "key string, ts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [("k", _ts(10.0), 100, 1.0), ("k", _ts(20.0), 101, None)],
        "key string, ts timestamp, rid int, val double",
    )
    [row] = asof_join(left, right, by=["key"], tiebreak="rid").collect()
    assert (row["rid"], row["val"]) == (101, None)


def test_asof_null_right_ts_never_matches(spark):
    left = spark.createDataFrame(
        [("k", _ts(25.0), 1)], "key string, ts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [("k", None, 100, 1.0)], "key string, ts timestamp, rid int, val double"
    )
    [row] = asof_join(left, right, by=["key"], tiebreak="rid").collect()
    assert (row["rid"], row["val"]) == (None, None)


def test_asof_name_collision_raises(frames):
    left, right = frames
    with pytest.raises(ValueError, match="collision"):
        # right's raw 'val'/'rid' are fine, but force a clash via lid
        asof_join(left, right.withColumnRenamed("rid", "lid"), by=["key"])


def test_asof_null_left_ts_unmatched_both_directions(spark):
    """A left row with a null `on` must come back unmatched in BOTH
    directions. Regression: forward's desc() ordering defaulted to
    NULLS LAST, which sorted null-ts left rows after every right row
    and handed them the group's earliest right row."""
    left = spark.createDataFrame(
        [("k", None, 1), ("k", _ts(5.0), 2)],
        "key string, ts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [("k", _ts(10.0), 100, 1.0)],
        "key string, ts timestamp, rid int, val double",
    )
    for direction in ("backward", "forward"):
        rows = {
            r["lid"]: (r["rid"], r["val"])
            for r in asof_join(
                left, right, by=["key"], direction=direction
            ).collect()
        }
        assert rows[1] == (None, None), direction
        expected = (None, None) if direction == "backward" else (100, 1.0)
        assert rows[2] == expected, direction


def test_asof_internal_name_collision_raises(frames):
    left, right = frames
    with pytest.raises(ValueError, match="internal name collision"):
        asof_join(left.withColumn("__side", F.lit(1)), right, by=["key"])
    with pytest.raises(ValueError, match="internal name collision"):
        asof_join(left.withColumn("__r_rid", F.lit(1)), right, by=["key"])


def test_range_join_internal_right_name_collision_raises(frames):
    """The right side's internal names (__bucket_r, __r_epoch) are
    reserved on the LEFT frame too — a left column with that name was
    silently dropped by the final .drop() instead of rejected."""
    left, right = frames
    for bad in ("__bucket_r", "__r_epoch"):
        with pytest.raises(ValueError, match="collision"):
            range_join(
                left.withColumn(bad, F.lit(1)),
                right,
                by=["key"],
                lower_sec=-1.0,
                upper_sec=0.0,
            )


def test_range_join_rejects_outer_and_collisions(frames):
    left, right = frames
    with pytest.raises(ValueError, match="how="):
        range_join(left, right, by=["key"], lower_sec=-1.0, upper_sec=0.0, how="full")
    chained = range_join(
        left, right, by=["key"], lower_sec=-1.0, upper_sec=0.0
    )
    with pytest.raises(ValueError, match="collision"):
        range_join(chained, right, by=["key"], lower_sec=-1.0, upper_sec=0.0)


def test_range_join_numeric_ts(spark):
    """Numeric (double) time axis takes the cast path, same semantics."""
    left = spark.createDataFrame(
        [("a", 10.0, 1), ("a", 25.0, 2)], "key string, ts double, lid int"
    )
    right = spark.createDataFrame(
        [("a", 4.0, 7), ("a", 9.0, 8), ("a", 24.0, 9)],
        "key string, ts double, rid int",
    )
    j = range_join(left, right, by=["key"], lower_sec=-10.0, upper_sec=0.0)
    got = {
        r["lid"]: r["n"]
        for r in j.groupBy("lid").agg(F.count("r_rid").alias("n")).collect()
    }
    assert got == {1: 2, 2: 1}
