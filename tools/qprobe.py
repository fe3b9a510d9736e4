"""Per-query optimization probe (guide §1): noop-sink timing + formatted
plan capture for any registry query, isolated from bench.py (which is
frozen for the driver's measurement).

Usage:
  python tools/qprobe.py NAME [NAME...] [--explain-dir DIR] [--reps N]
      [--time-mode noop|count]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 — the driver's
measurement scale), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--time-mode", choices=["noop", "count"], default="noop")
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    from wcm_spark.datapipe.queries import spark_queries
    from wcm_spark.session import get_spark

    spark = get_spark("wcm-qprobe", cpus=CPUS, shuffle_partitions=CPUS)
    qs = spark_queries()
    # same warm-up as bench._run_sweep so first-query numbers compare
    os.environ.setdefault("WCM_IMAGES_N", "8000")
    from wcm_spark.datapipe.fixtures import images_table_path

    images_table_path()
    (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .groupBy("lang").count().count()
    )
    results = {}
    for name in args.names:
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = os.path.join(args.explain_dir, f"{name}{args.suffix}.txt")
            with open(out, "w") as f:
                f.write(plan)
            print(f"wrote {out}", file=sys.stderr)
        times = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"qprobe:{name}")
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            if args.time_mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            times.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        results[name] = times
        print(f"{name}: {times}")
    spark.stop()


if __name__ == "__main__":
    main()
