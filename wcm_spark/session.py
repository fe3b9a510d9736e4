"""SparkSession factory with the engine's tuning defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "recommended_sql_confs"]


def recommended_sql_confs() -> dict[str, str]:
    """The engine's runtime SQL confs, shared by get_spark and the
    spark-submit entry point (submit_main.py) so the two launch shapes
    cannot drift. Values honor the same env overrides in both."""
    return {
        # AQE off by default: its shuffle-coalescing repeatedly collapsed
        # the Python-UDF stages of this workload onto 1-2 cores (measured
        # 4x wall-clock regressions at local[32]); skew is handled
        # explicitly via host_salt partitioning and shingle-based
        # candidate generation. Re-enable per-job for large
        # shuffle-join-heavy plans. (The engine still FUNCTIONS with AQE
        # on — pinned by tests/test_submit.py.)
        "spark.sql.adaptive.enabled": os.environ.get("WCM_AQE", "false"),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        # InferFiltersFromGenerate synthesizes `size(arr) > 0` under every
        # non-outer explode; filter pushdown then substitutes the WHOLE
        # array-building expression into that filter and pushes it below
        # any exchange — so the tokenize->shingle/chunk chains of the
        # text-pipeline queries were evaluated twice, with the first
        # evaluation on the un-repartitioned scan split (1-2 cores).
        # Measured: passage_dedup_rate 28.4s -> 1.8s at sf1.0/local[32].
        # Every Generate in this engine explodes a COMPUTED array (tokens,
        # shingles, subvectors), never a scan column the inferred filter
        # could prune at the source, so the rule is pure duplicated work
        # here at any scale. Override with WCM_EXCLUDED_OPT_RULES.
        "spark.sql.optimizer.excludedRules": os.environ.get(
            "WCM_EXCLUDED_OPT_RULES",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        ),
        # generic conf escape hatch for A/B experiments and site tuning:
        # semicolon-separated key=value pairs, applied last
        **dict(
            kv.split("=", 1)
            for kv in os.environ.get("WCM_SQL_CONF_EXTRA", "").split(";")
            if "=" in kv
        ),
    }


def _warm_python_workers(spark: SparkSession, cpus: int) -> None:
    """Fork the Python worker pool and pay its numpy/pyarrow imports at
    session build — infrastructure provisioning, same class as executor
    JVM startup. A fresh session otherwise charges the ~1-2 s spin-up of
    `cpus` workers (fork + first numpy/pyarrow import each) to whichever
    Arrow-kernel stage happens to run first. One tiny task per core;
    best-effort and idempotent per session."""
    if os.environ.get("WCM_POOL_WARM", "1") != "1":
        return
    if spark.conf.get("wcm.workers.warmed", None) == "true":
        return

    def _touch(batches):
        import numpy  # noqa: F401  (the Arrow kernels' first import)

        yield from batches

    try:
        spark.range(cpus, numPartitions=cpus).mapInArrow(
            _touch, "id BIGINT"
        ).count()
        spark.conf.set("wcm.workers.warmed", "true")
    except Exception:
        pass  # warming is never worth failing a session over


def get_spark(
    app: str = "wcm-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """local[k] session tuned for the iterative crawl workload.

    AQE stays on (runtime coalescing + skew-join splitting are part of the
    skew story); Arrow is mandatory for every pandas UDF in the engine;
    shuffle partitions default to the core count — at cluster scale these
    come from spark-submit conf instead.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cpus
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config(map=recommended_sql_confs())
        # (A/B: uncompressed columnar cache is NOT faster here — the 8g
        # heap prefers compact cached bodies; keep Spark's default true)
        .config("spark.sql.inMemoryColumnarStorage.compressed",
                os.environ.get("WCM_CACHE_COMPRESS", "true"))
        # local mode: the "driver" JVM hosts every executor thread and the
        # block manager. Counter-intuitively, a LARGER heap is ~2x slower
        # on this workload (A/B measured 41-57s @8g vs 75-78s @48g for the
        # 5-wave crawl: fresh-page zeroing + bigger G1 live sets show up as
        # 40-60% kernel time) — keep the heap small and let the OS page
        # cache hold the rest.
        .config("spark.driver.memory", os.environ.get("WCM_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    _warm_python_workers(spark, cpus)
    return spark
