#!/usr/bin/env python3
"""Re-pin the bench window-gate floors from a closing bench artifact.

The three window gates (canary duck-ratio basket, dispatch floor basket,
shuffle-round floor basket) compare each probe query's per-run MIN against
a pinned quiet-window floor. Those floors drift stale when code changes
move a probe's quiet cost (VERDICT r10 "What's wrong" #3: a stale-HIGH
floor absorbs real inflation before the gate sees it; a stale-LOW one
burns the retry budget on phantom degradation). The stated rule is to
re-pin on each quiet closing artifact — this script IS that rule:

    python3 tools/pin_floors.py bench_out.json bench_floors.json

It refuses artifacts whose window is not "ok" (pinning floors from a
degraded window would bake the burst into the baseline) unless --force
is given — the documented bootstrap for FOREIGN HARDWARE (ADVICE r10:
absolute per-query floors are host-specific; on a new host, run the
bench once, expect "degraded" against the old host's floors, then
--force-pin from that run and re-run).
"""
import json
import sys

CANARY = ["d10_jaccard_join", "d7_source_overlap", "d12_substring_dedup",
          "t15_novelty", "t10_tfidf_topk", "e8_knn_graph", "e10_twostage_topk"]
DISPATCH = ["q1_filter_order_limit", "q2_like", "q5_time_range", "q7_string_funcs"]
SHUFFLE = ["q19_rollup", "q4_group_by", "q22_salted_agg",
           "m5_phash_pairs", "m7_audio_pairs", "d18_boilerplate"]


def main():
    args = [a for a in sys.argv[1:] if a != "--force"]
    force = "--force" in sys.argv
    if len(args) != 2:
        print(__doc__)
        sys.exit(2)
    src, dst = args
    art = json.load(open(src))
    window = art.get("window")
    if window != "ok" and not force:
        print(f"refusing to pin floors from a window={window!r} artifact "
              f"(--force to bootstrap a new host)")
        sys.exit(1)
    qmin = art["queries_min"]
    missing = [q for q in CANARY + DISPATCH + SHUFFLE if q not in qmin]
    if missing:
        print(f"artifact lacks probe minima for: {missing}")
        sys.exit(1)
    out = {
        "pinned_from": {
            "artifact": src,
            "window": window,
            "ratio": art.get("ratio"),
            "ratio_min": art.get("ratio_min"),
            "sf": art.get("sf"),
        },
        "canary": {q: qmin[q] for q in CANARY},
        "dispatch": {q: qmin[q] for q in DISPATCH},
        "shuffle": {q: qmin[q] for q in SHUFFLE},
    }
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"pinned {len(CANARY)}+{len(DISPATCH)}+{len(SHUFFLE)} floors "
          f"from {src} (window={window}) -> {dst}")


if __name__ == "__main__":
    main()
