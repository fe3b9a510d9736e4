"""The r6 PQ NumPy kernel replaces Spark-side round(x, 6) with
_round6_half_up_np — Spark rounds doubles as BigDecimal.valueOf(x)
.setScale(6, HALF_UP), i.e. HALF_UP over the SHORTEST round-trip
decimal repr, and the ADC code assignment hash-depends on every one of
those values. These tests pin the emulation against Spark itself on
adversarial inputs (exact 7th-digit-5 ties, 6-decimal-quantized
multiples, float32-derived values) and the kernel's first-minimum tie
rule against the SQL array_position semantics."""

import numpy as np

from wcm_spark.datapipe.queries import _pq_dists_codes, _round6_half_up_np


def _spark_round6(spark, vals):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"x": vals}))
    return np.array(
        [r["y"] for r in df.selectExpr("round(x, 6) AS y").collect()]
    )


def test_round6_matches_spark_on_adversarial_values(spark):
    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [
            rng.uniform(0, 800, 20000),
            np.round(rng.uniform(0, 100, 20000), 6),
            np.arange(0, 2000) * 1e-7,  # dense near-origin incl. ties
            np.arange(1000) + 0.0000005,  # exact 7th-digit-5 ties
            np.arange(20000) * 1e-6 + 5e-7,  # tie ladder
            rng.uniform(0, 4, 20000).astype(np.float32).astype(np.float64),
            rng.uniform(-2, 2, 20000) ** 2,  # squared diffs
        ]
    )
    got = _spark_round6(spark, vals)
    mine = _round6_half_up_np(vals)
    bad = np.nonzero(got != mine)[0]
    assert len(bad) == 0, [
        (repr(float(vals[i])), float(got[i]), float(mine[i]))
        for i in bad[:5]
    ]


def test_dists_codes_first_min_tie_rule():
    # two codes at identical rounded distance -> the LOWER code wins
    # (SQL: array_position(d2s, array_min(d2s)) finds the FIRST min)
    cb = np.full((1, 3, 2), np.nan)
    cb[0, 0] = [10.0, 10.0]  # far
    cb[0, 1] = [1.0, 1.0]  # tied with code 2
    cb[0, 2] = [1.0, 1.0]
    d2r, codes = _pq_dists_codes(
        np.array([[1.0, 1.0]]), np.array([0]), cb
    )
    assert codes[0] == 1
    assert d2r[0, 1] == d2r[0, 2] == 0.0


def test_dists_codes_unassigned_ranks_inf():
    cb = np.full((1, 3, 2), np.nan)  # codes 0 and 2 unassigned
    cb[0, 1] = [0.5, 0.5]
    d2r, codes = _pq_dists_codes(
        np.array([[0.0, 0.0]]), np.array([0]), cb
    )
    assert codes[0] == 1
    assert np.isinf(d2r[0, 0]) and np.isinf(d2r[0, 2])
