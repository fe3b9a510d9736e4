"""Driver-gate rehearsal: every oracle-checked query must match DuckDB.

Mirrors what the driver does at sf0.01 (row count + schema + order-
insensitive value hash): runs each Spark query and its oracle SQL at
sf0.001 and compares normalized sorted rows.
"""

import math
import os

import duckdb
import pytest

from wcm_spark.datapipe.queries import TABLES, oracle_sqls, spark_queries

SF_DIR = os.environ.get("WCM_TEST_SF_DIR", "/root/testdata/sf0.001")

ORACLES = oracle_sqls()
QUERIES = spark_queries()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # EXACT comparison on purpose: the driver hashes raw values, so a
        # 1-ULP cross-engine difference is a real failure — the queries
        # must round at the SQL level such that both engines emit
        # identical doubles
        return v
    if hasattr(v, "item"):  # numpy scalars from duckdb
        return _norm(v.item())
    return v


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in data)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_data = [tuple(r) for r in sdf.collect()]

    cur = duck.execute(ORACLES[name])
    duck_cols = [c[0] for c in cur.description]
    duck_data = cur.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    got, want = _rows(spark_cols, spark_data), _rows(duck_cols, duck_data)
    assert len(got) == len(want), f"{name}: rowcount {len(got)} vs {len(want)}"
    assert got == want, f"{name}: value mismatch; first diff: " + str(
        next((a, b) for a, b in zip(got, want) if a != b)
    )


def test_neardup_cluster_convergence(duck):
    """NEARDUP_CC_ITERS must cover the fixture's largest cluster diameter:
    the fixed-depth propagation equals a 2-hops-deeper run."""
    from wcm_spark.datapipe.queries import NEARDUP_CC_ITERS, _q_neardup_clusters

    base = sorted(duck.execute(_q_neardup_clusters("duck", None)).fetchall())
    deeper = sorted(
        duck.execute(
            _q_neardup_clusters("duck", None, iters=NEARDUP_CC_ITERS + 2)
        ).fetchall()
    )
    assert base == deeper


def test_image_caption_pick_convergence_and_geometry(duck):
    """IMG_CC_ITERS covers the image fixture's cluster diameter (equal to
    a 2-hops-deeper run), and the fixture keeps the REAL hamming<=8 gate
    non-trivial: clusters exist, some LSH candidates are rejected by the
    gate, and no cluster spans two unrelated base images."""
    from wcm_spark.datapipe.queries import (
        IMG_CC_ITERS,
        _image_pair_ctes,
        _q_image_caption_pick,
    )

    base = sorted(duck.execute(_q_image_caption_pick("duck", None)).fetchall())
    deeper = sorted(
        duck.execute(
            _q_image_caption_pick("duck", None, iters=IMG_CC_ITERS + 2)
        ).fetchall()
    )
    assert base == deeper
    assert len(base) > 0
    # gate non-trivial: the unbounded candidate set is strictly larger
    n_cand, n_kept = duck.execute(
        f"WITH {_image_pair_ctes('duck', 64)} SELECT "
        "count(*), sum(CASE WHEN hamming <= 8 THEN 1 ELSE 0 END) FROM ipairs"
    ).fetchone()
    assert n_kept > 0 and n_cand > n_kept
    # no cross-base pair survives the gate (image_id embeds the base idx)
    [n_cross] = duck.execute(
        f"WITH {_image_pair_ctes('duck', 8)} SELECT count(*) FROM ipairs "
        "WHERE substr(ia, 11, 4) != substr(ib, 11, 4)"
    ).fetchone()
    assert n_cross == 0


def test_images_table_size_override(duck):
    """images_table_path scales with an explicit n_base (bench raises it
    via WCM_IMAGES_N for non-toy sweep entries) and stays
    content-addressed per size — the pinned 90-base default is untouched."""
    from wcm_spark.datapipe.fixtures import images_table_path

    small = images_table_path(12)
    default = images_table_path()
    assert small != default
    [n] = duck.execute(
        f"SELECT count(*) FROM read_parquet('{small}')"
    ).fetchone()
    assert 12 < n <= 12 * 2  # bases + engineered variants


def test_image_shard_packing_geometry(duck):
    """At the fixture override budget every group splits into multiple
    shards, per-group offsets are dense (contiguous byte stream), and no
    shard except possibly the last of a group overruns by more than one
    sample (greedy first-byte assignment)."""
    from wcm_spark.datapipe.queries import SYNTHETIC_GATES, _BUILDERS

    gate = SYNTHETIC_GATES["image_shard_packing"]
    rows = duck.execute(
        _BUILDERS["image_shard_packing"]("duck", None, **gate)
    ).fetchall()
    by_grp: dict[int, list] = {}
    for image_id, grp, n_bytes, start_off, shard_id in rows:
        by_grp.setdefault(grp, []).append((image_id, n_bytes, start_off, shard_id))
    assert len(by_grp) == 8
    multi = 0
    for grp, items in by_grp.items():
        items.sort()  # FIFO by image_id
        off = 0
        for _, n_bytes, start_off, shard_id in items:
            assert start_off == off  # dense cumsum
            assert shard_id == start_off // gate["shard_bytes"]
            off += n_bytes
        if items[-1][3] > 0:
            multi += 1
    assert multi == len(by_grp)  # budget chosen so every group splits


def test_spark_only_queries_run(spark):
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
