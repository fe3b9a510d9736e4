"""Standalone probe-gated skew-axis measurement.

bench.py's in-run skew block runs LAST (after the pairs and crawl have
heated the box) and only waits on the weak 1-proc quick floor, so both
round-5 commit-time artifacts measured it in a collapsed tail (ratios
0.442 / 0.626 with flagged brackets) while the healthy-window record
reads 1.009. This tool runs ONLY the skew comparison — uniform vs
zipf-hot-half corpus, same politeness cap, back-to-back in one window —
behind the full 8-proc probe gate, appending a ``skew_window`` event to
BENCH/hunt_r5.jsonl so the durable record accumulates properly-gated
samples the same way the crawl and pair bars do.

Usage: python tools/skew_probe.py [--rounds 2] [--floor 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

LOG = os.path.join(REPO, "BENCH", "hunt_r5.jsonl")
RUN_ID = f"skew-{os.getpid()}-{int(time.time())}"


def _log(rec: dict) -> None:
    rec["run"] = RUN_ID
    rec["t"] = round(time.time(), 1)
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--floor", type=float, default=8.0,
                    help="8-proc copy bandwidth floor (GB/s) per round")
    ap.add_argument("--max-wait", type=float, default=600.0)
    args = ap.parse_args()

    from wcm_spark.corpus import corpus_df, corpus_df_sized
    from wcm_spark.session import get_spark

    sites, pages_per_site = bench._corpus_size()
    total_pages = sites * pages_per_site
    hot = total_pages // 2
    cold = max(1, (total_pages - hot) // max(sites - 1, 1))
    tmp = tempfile.mkdtemp(prefix="wcm-skew-probe-")
    uni_path = os.path.join(tmp, "uniform.parquet")
    zipf_path = os.path.join(tmp, "zipf.parquet")
    spark = get_spark("wcm-skew-corpus", cpus=8, shuffle_partitions=8)
    corpus_df(spark, sites, pages_per_site).write.mode("overwrite").parquet(uni_path)
    corpus_df_sized(spark, [hot] + [cold] * (sites - 1)).write.mode(
        "overwrite"
    ).parquet(zipf_path)
    spark.stop()
    _log({"ev": "skew_corpus_ready", "uniform": uni_path, "zipf": zipf_path,
          "hot_pages": hot, "sites": sites})

    cap = max(total_pages // 8, 64)
    os.environ["WCM_BENCH_CAP"] = str(cap)
    try:
        for _ in range(args.rounds):
            gate = bench._probe_gate(args.floor, args.max_wait)
            s_uni = bench._spawn(bench.CPUS, uni_path, repeats=1,
                                 mode="crawl_capped")
            s_zipf = bench._spawn(bench.CPUS, zipf_path, repeats=1,
                                  mode="crawl_capped")
            post = bench._post_bw(1.0)
            ratio = round(
                s_zipf["urls_per_sec"] / max(s_uni["urls_per_sec"], 1e-9), 3
            )
            _log({"ev": "skew_window", "cap_max_conn_per_host": cap,
                  "uniform": s_uni, "zipf_hot_half": s_zipf,
                  "zipf_over_uniform": ratio, "probe_gate": gate,
                  "bw_post_gb_s": post,
                  "met": ratio >= 0.667,
                  "bar": "zipf within 1.5x of uniform => ratio >= 0.667"})
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
