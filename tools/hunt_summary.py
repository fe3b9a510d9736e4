"""Summarize BENCH/hunt_*.jsonl into the medians-vs-null table the
scaling-evidence docs lead with.

Counts every pair_round/null_round by its `pair` tag, reports n /
median / best / rounds>=0.8 per (kind, geometry), engine-vs-null
median ratios, bracket-stable medians (rounds whose per-leg bandwidth
brackets stayed within 2x), and the crawl_window record. Read-only —
prints markdown to stdout for pasting into BENCH/BASELINE.md / README.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

# External pauses (e.g. the hunt SIGSTOPped for a pytest run): any
# measurement round whose [previous event t, own t] interval overlaps a
# recorded pause had a leg frozen mid-flight — its wall-clock timing is
# meaningless and it is excluded from every table below (the raw log
# keeps it; BENCH/hunt_r5_pause.json documents why).
PAUSE_FILE = os.path.join(os.path.dirname(__file__), "..", "BENCH", "hunt_r5_pause.json")


def load_pauses() -> list[tuple[float, float]]:
    try:
        with open(PAUSE_FILE) as f:
            rec = json.load(f)
        recs = rec if isinstance(rec, list) else [rec]
        return [(r["start"], r["end"]) for r in recs]
    except (OSError, KeyError, ValueError):
        return []


def load(paths: list[str]) -> list[dict]:
    rows: list[dict] = []
    for p in paths:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
    return rows


def bracket_stable(r: dict) -> bool:
    """True when every recorded (pre, post) bracket in the round moved
    < 2x — both legs measured the same host weather."""
    bws = []
    for leg in ("lo", "hi"):
        d = r.get(leg) or {}
        for k in ("bw_pre_gb_s", "bw_post_gb_s"):
            if isinstance(d.get(k), (int, float)):
                bws.append(d[k])
    for k in ("bw_pre_gb_s", "bw_post_gb_s"):
        if isinstance(r.get(k), (int, float)):
            bws.append(r[k])
    if len(bws) < 2:
        return True  # no bracket recorded: cannot judge, keep
    lo, hi = min(bws), max(bws)
    return hi <= 2.0 * max(lo, 1e-9)


def main(paths: list[str]) -> None:
    rows = load(paths)
    pauses = load_pauses()
    geoms: dict[tuple, list[dict]] = {}
    prev_t = 0.0
    excluded = 0
    derived_tag_rounds = 0
    for r in rows:
        start_t, prev_t = prev_t, r.get("t", prev_t)
        if r.get("ev") in ("pair_round", "null_round") and r.get("efficiency") is not None:
            if any(start_t < pe and r.get("t", 0) > ps for ps, pe in pauses):
                excluded += 1
                continue
            # early r4 hunter rounds predate the pair tag — derive the
            # geometry from the lo/hi core fields (the documented
            # counting rule; those rounds all ran the 1x corpus). When a
            # corpus-size field IS present on an untagged round, honor it
            # instead of silently folding a sized round into the 1x
            # bucket (ADVICE r5), and count derived-tag rounds visibly.
            pair = r.get("pair")
            if not pair:
                if (isinstance(r.get("lo"), dict) and isinstance(r.get("hi"), dict)
                        and "cores" in r["lo"] and "cores" in r["hi"]):
                    pair = f"{r['lo']['cores']}to{r['hi']['cores']}"
                    cs = r.get("corpus_size") or r.get("corpus_x")
                    if cs and str(cs) not in ("1", "1x"):
                        pair += f"@{cs}" if str(cs).endswith("x") else f"@{cs}x"
                    derived_tag_rounds += 1
                else:
                    pair = "?"
            geoms.setdefault((r["ev"], pair), []).append(r)
    if excluded:
        print(f"(excluded {excluded} round(s) overlapping recorded external pauses)")
    if derived_tag_rounds:
        print(f"(geometry derived from lo/hi cores for {derived_tag_rounds} pre-pair-tag round(s))")

    print("| measurement | n | eff best | eff median | median(stable) | rounds >= 0.8 |")
    print("|---|---|---|---|---|---|")
    med: dict[tuple, float] = {}
    for (kind, pair), rs in sorted(geoms.items()):
        effs = sorted(r["efficiency"] for r in rs)
        stable = sorted(r["efficiency"] for r in rs if bracket_stable(r))
        m = statistics.median(effs)
        med[(kind, pair)] = m
        ms = f"{statistics.median(stable):.3f} (n={len(stable)})" if stable else "—"
        label = "engine pair" if kind == "pair_round" else "null control"
        ge = sum(1 for e in effs if e >= 0.8)
        print(
            f"| {label} {pair} | {len(effs)} | {max(effs):.3f} | "
            f"**{m:.3f}** | {ms} | {ge}/{len(effs)} |"
        )
    for pair in sorted({p for k, p in med if k == "pair_round"}):
        e, n = med.get(("pair_round", pair)), med.get(("null_round", pair))
        if e is not None and n:
            print(f"engine-vs-null median ratio {pair}: {e / n:.3f}")

    crawls = [r for r in rows if r.get("ev") == "crawl_window"]
    if crawls:
        met = sum(1 for c in crawls if c.get("met"))
        meds = [c["median"] for c in crawls]
        print(
            f"crawl windows: {met}/{len(crawls)} met >=10k; medians "
            + " / ".join(f"{m:,.1f}" for m in meds)
        )


if __name__ == "__main__":
    main(sys.argv[1:] or ["BENCH/hunt_r5.jsonl"])
