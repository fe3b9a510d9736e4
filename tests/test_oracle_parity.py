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


def test_spark_only_queries_run(spark):
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
