"""Estimator-quality floors: the ANN recall queries report numbers, and
nothing used to FAIL if a refactor dropped recall to random. These pin
mean recall@3 on the fixture geometry (deterministic — fits and probes
are seed-free by construction), with margin below the measured values
(ivf_fitted 0.889, pq_adc 0.633, ivfpq_adc 0.467 at sf0.001) so benign
re-fits pass but a broken estimator breaks the suite."""

import os

from wcm_spark.datapipe.queries import spark_queries

SF = os.environ.get("WCM_TEST_SF_DIR", "/root/testdata/sf0.001")


def _mean_recall(spark, name, **filt):
    df = spark_queries()[name](spark, SF)
    rows = df.collect()
    if filt:
        col, val = next(iter(filt.items()))
        rows = [r for r in rows if r[col] == val]
    assert rows
    return sum(r["recall_at_3"] for r in rows) / len(rows)


def test_ivf_fitted_recall_floor(spark):
    assert _mean_recall(spark, "ann_recall_at_k", method="ivf_fitted") >= 0.6


def test_pq_adc_recall_floor(spark):
    assert _mean_recall(spark, "ann_pq_recall_at_k") >= 0.45


def test_ivfpq_adc_recall_floor(spark):
    assert _mean_recall(spark, "ann_ivfpq_recall_at_k") >= 0.3
