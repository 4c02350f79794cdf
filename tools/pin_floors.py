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

Ratchet guard (VERDICT r11 "What's wrong" #3): a --force re-pin on a
noisy day raised the pins ~15% above what a genuinely calm window
measures, so a mildly-inflated window could certify "ok". Re-pinning is
therefore DOWNWARD-ONLY by default: each probe's new pin is
min(artifact_min, existing_pin), and a "historical" map keeps the best
floor ever observed per probe beside the pins. Raising a pin requires
--force-up together with --reason "..." (recorded in the file), for the
one legitimate case — a deliberate code change that made a probe
slower — and the file always records drift-vs-historical so a reader
can see exactly what "ok" currently certifies.

--force still bypasses the window=="ok" requirement (the documented
bootstrap for FOREIGN HARDWARE: absolute per-query floors are
host-specific; on a new host, run the bench once, expect "degraded"
against the old host's floors, then --force --force-up --reason
"new host bootstrap" and re-run).
"""
import json
import os
import sys

CANARY = ["d10_jaccard_join", "d7_source_overlap", "d12_substring_dedup",
          "t15_novelty", "t10_tfidf_topk", "e8_knn_graph", "e10_twostage_topk"]
DISPATCH = ["q1_filter_order_limit", "q2_like", "q5_time_range", "q7_string_funcs"]
SHUFFLE = ["q19_rollup", "q4_group_by", "q22_salted_agg",
           "m5_phash_pairs", "m7_audio_pairs", "d18_boilerplate"]


def main():
    force = "--force" in sys.argv
    force_up = "--force-up" in sys.argv
    reason = None
    argv = [a for a in sys.argv[1:] if a not in ("--force", "--force-up")]
    if "--reason" in argv:
        i = argv.index("--reason")
        reason = argv[i + 1]
        del argv[i:i + 2]
    if len(argv) != 2:
        print(__doc__)
        sys.exit(2)
    if force_up and not reason:
        print("--force-up requires --reason \"why this probe got slower\"")
        sys.exit(2)
    src, dst = argv
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

    prev = json.load(open(dst)) if os.path.exists(dst) else {}
    prev_pins = {}
    for basket in ("canary", "dispatch", "shuffle"):
        prev_pins.update(prev.get(basket, {}))
    hist = dict(prev.get("historical", prev_pins))

    raised = []
    def pin(q):
        new = qmin[q]
        old = prev_pins.get(q)
        # historical best is monotone-min regardless of pin direction
        hist[q] = min(new, hist.get(q, new))
        if old is not None and new > old and not force_up:
            return old  # downward-only: keep the existing (lower) pin
        if old is not None and new > old:
            raised.append(f"{q}: {old} -> {new}")
        return new

    pins = {q: pin(q) for q in CANARY + DISPATCH + SHUFFLE}
    drift = {q: round(pins[q] / hist[q], 4) for q in pins if hist[q] > 0}
    out = {
        "pinned_from": {
            "artifact": src,
            "window": window,
            "ratio": art.get("ratio"),
            "ratio_min": art.get("ratio_min"),
            "sf": art.get("sf"),
        },
        "canary": {q: pins[q] for q in CANARY},
        "dispatch": {q: pins[q] for q in DISPATCH},
        "shuffle": {q: pins[q] for q in SHUFFLE},
        "historical": {q: hist[q] for q in sorted(hist)},
        # pin/historical-best per probe: what "window ok" CERTIFIES.
        # 1.0 = the pin is the best floor ever seen; 1.15 = a window 15%
        # above true capability could read at-floor.
        "drift_vs_historical": drift,
        "drift_max": max(drift.values()) if drift else None,
    }
    if raised:
        out["pinned_from"]["force_up_reason"] = reason
        out["pinned_from"]["force_up_raised"] = raised
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    kept = sum(1 for q in pins if prev_pins.get(q) is not None
               and pins[q] == prev_pins[q] and qmin[q] > prev_pins[q])
    print(f"pinned {len(CANARY)}+{len(DISPATCH)}+{len(SHUFFLE)} floors "
          f"from {src} (window={window}) -> {dst}; "
          f"{kept} kept lower existing pins (downward-only), "
          f"{len(raised)} raised{' [' + reason + ']' if raised else ''}, "
          f"max drift vs historical {out['drift_max']}")


if __name__ == "__main__":
    main()
