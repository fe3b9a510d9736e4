"""spark-submit entry point (north rule: launched via spark-submit --py-files).

Package and launch:

    python -m zipfile -c /tmp/wcm_spark.zip wcm_spark
    spark-submit --master local[32] \
        --py-files /tmp/wcm_spark.zip \
        submit_main.py --sites 64 --pages 100 --checkpoint /tmp/crawl-ckpt

On a cluster, swap --master for the cluster manager; the engine itself is
master-agnostic (no local-mode assumptions in the plan: partitioning,
politeness and seq assignment are all data-driven).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description="wcm_spark crawl job")
    ap.add_argument("--sites", type=int, default=16)
    ap.add_argument("--pages", type=int, default=40)
    ap.add_argument("--max-conn", type=int, default=None)
    ap.add_argument("--max-conn-per-host", type=int, default=None)
    ap.add_argument("--max-waves", type=int, default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--images", action="store_true")
    ap.add_argument("--output", default=None, help="parquet dir for the visit log")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from wcm_spark.corpus import corpus_df, seed_urls
    from wcm_spark.scheduler import CrawlConfig, Crawler

    spark = SparkSession.builder.appName("wcm-spark-crawl").getOrCreate()

    corpus = corpus_df(spark, args.sites, args.pages).cache()
    cfg = CrawlConfig(
        max_conn=args.max_conn,
        max_conn_per_host=args.max_conn_per_host,
        max_waves=args.max_waves,
        checkpoint_dir=args.checkpoint,
        collect_images=args.images,
        expected_urls=max(args.sites * args.pages * 4, 100_000),
    )
    if args.resume:
        result = Crawler.resume(spark, corpus, cfg)
    else:
        result = Crawler(spark, corpus, cfg).run(seed_urls(args.sites))

    if args.output:
        result.visits.write.mode("overwrite").parquet(args.output)
    print(
        json.dumps(
            dict(
                waves=result.waves,
                fetched=result.fetched,
                metrics_tail=result.metrics[-3:],
            )
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
