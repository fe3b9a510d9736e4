"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: one politeness-cut frontier wave with digest dedup
               over a synthetic frontier derived from sf0.001 documents.
queries()    — every implemented operator from SURVEY.md §2 + the
               training-data pipeline ops; see wcm_spark/datapipe/queries.py.
oracle_sql() — DuckDB-equivalent SQL per query. Since round 4 this covers
               the engine-native queries too: the crawl loop (unrolled
               wave-by-wave SQL BFS over a shared fixture parquet), scrape
               (emit-ordered SQL re-extraction), the image sink and the
               multimodal kernels (generator-computed expected values) —
               see wcm_spark/datapipe/fixtures.py. Every queries() entry
               has an oracle_sql() entry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wcm_spark.datapipe.queries import oracle_sqls, spark_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: frontier wave scheduling (F1 politeness cut + D1 digest +
    D2 seen anti-join) over /root/testdata/sf0.001 documents."""
    qs = spark_queries()
    return qs["wave_cut_politeness"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    return oracle_sqls()
