"""One-shot 4x-corpus amortization probe for the prescribed 8->32 pair.

The r5 hunt measured the prescribed pair at three input sizes and the
efficiency climbs with input size in the same windows (1x median 0.533,
2x median 0.626) because the fixed per-job cost (session, plan
analysis, pool warm-up) stops dominating the 32-core leg as the job
grows. This script adds the 4x point: same protocol as
tools/window_hunt.py's pair rounds (probe-gated, bandwidth-bracketed,
same-window null control), pair tag ``8to32@4x``, appended to
BENCH/hunt_r5.jsonl so tools/hunt_summary.py and bench.py's merged
evidence pick it up with zero extra plumbing.

Usage: python tools/pair4x.py [--rounds 3] [--corpus4 <parquet>]
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
RUN_ID = f"pair4x-{os.getpid()}-{int(time.time())}"


def _log(rec: dict) -> None:
    rec["run"] = RUN_ID
    rec["t"] = round(time.time(), 1)
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--quick-floor", type=float, default=1.5)
    ap.add_argument("--corpus4", default=None,
                    help="reuse an existing 4x corpus parquet")
    args = ap.parse_args()

    corpus4, tmp = args.corpus4, None
    if not corpus4:
        from wcm_spark.corpus import corpus_df
        from wcm_spark.session import get_spark

        sites, pages_per_site = bench._corpus_size()
        tmp = tempfile.mkdtemp(prefix="wcm-hunt-corpus-4x-")
        corpus4 = os.path.join(tmp, "corpus.parquet")
        spark = get_spark("wcm-4x-corpus", cpus=8, shuffle_partitions=8)
        corpus_df(spark, sites * 4, pages_per_site).write.mode(
            "overwrite"
        ).parquet(corpus4)
        spark.stop()
        _log({"ev": "corpus_ready", "path": corpus4,
              "note": "4x sites of sf0.1 geometry"})

    lo_cores, hi_cores = max(2, bench.CPUS // 4), bench.CPUS
    factor = hi_cores / lo_cores
    try:
        for _ in range(args.rounds):
            pre = bench._await_window(args.quick_floor)
            lo = bench._spawn(lo_cores, corpus4, repeats=1, mode="pipeline")
            hi = bench._spawn(hi_cores, corpus4, repeats=1, mode="pipeline")
            post = bench._post_bw(args.quick_floor)
            eff = (hi["urls_per_sec"] / max(lo["urls_per_sec"], 1e-9)) / factor
            _log({"ev": "pair_round", "lo": lo, "hi": hi,
                  "pair": f"{lo_cores}to{hi_cores}@4x",
                  "efficiency": round(eff, 3),
                  "bw_pre_gb_s": pre, "bw_post_gb_s": post,
                  "met": eff >= 0.8})
            nlo = bench._spawn(lo_cores, corpus4, repeats=1, mode="null")
            nhi = bench._spawn(hi_cores, corpus4, repeats=1, mode="null")
            neff = (nhi["urls_per_sec"] / max(nlo["urls_per_sec"], 1e-9)) / factor
            _log({"ev": "null_round", "lo": nlo, "hi": nhi,
                  "pair": f"{lo_cores}to{hi_cores}@4x",
                  "efficiency": round(neff, 3),
                  "engine_vs_null": round(eff / max(neff, 1e-9), 3),
                  "bw_post_gb_s": bench._post_bw(args.quick_floor)})
    finally:
        if tmp:
            shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
