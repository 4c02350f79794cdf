#!/usr/bin/env python3
"""Same-session DuckDB baseline timings for the comparable bench queries.

Usage: python3 tools/duck_bench.py <sfDir> <oracle_sql.json> [outJson]

Runs every oracle SQL with DuckDB (threads = CPU count) on the same
parquet tables the Spark bench reads, median of 3 passes after one
warmup, and writes {"queries": {name: sec}, "total": sec, ...}.

EXCLUDED (deliberately-naive ground-truth oracles, not baselines — the
honest-comparison set judge & builder converged on in rounds 3-4): the
recursive-closure cluster oracles (d5/d6), all-pairs oracles (d2/d9/
d10), and h5's recursive SQL. Their Spark implementations are the
scalable algorithms; timing the naive oracle would flatter Spark.

Run this IN THE SAME SESSION as graft.Bench (same host load) so the
ratio BENCH/DUCK is like-for-like; commit the output as DUCK_times.json.
"""
import json, os, statistics, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

NOT_BASELINES = {"d2_minhash_lsh", "d5_dedup_clusters", "d6_dedup_apply",
                 "d9_embedding_dedup", "d10_jaccard_join", "h5_llm_sql_dedup",
                 "s5_cluster_split", "d14_edit_dedup", "d15_semantic_clusters",
                 # d20's oracle is the naive all-pairs crawl-x-index
                 # Jaccard ground truth.
                 "d20_incremental_neardup",
                 # d19 wraps d15's recursive-closure ground truth.
                 "d19_semantic_dedup",
                 "m5_phash_pairs", "m7_audio_pairs", "m8_video_pairs",
                 # m9/m10 oracles re-derive every PIXEL from payload hex
                 # via per-element list lambdas (~0.8 s each at fixture
                 # scale) — ground truth, not a reasonable baseline;
                 # including them flatters the Spark ratio.
                 "m9_pgm_decode", "m10_pgm_resize",
                 # m11's oracle likewise re-derives every RGB channel
                 # byte + the luma fingerprint from payload hex.
                 "m11_ppm_decode",
                 # m12/m13 oracles re-derive every int16 PCM sample
                 # (and every resampled output sample) from payload hex
                 # (same per-element list-lambda ground truth as m9-m11,
                 # on audio).
                 "m12_wav_decode", "m13_wav_resample",
                 # t18's oracle re-derives BPE TRAINING as 10 unrolled
                 # list-fold CTE stages (~23 s at sf0.1) purely as ground
                 # truth; the Spark side trains once as a memoized build
                 # artifact. Timing the naive unrolled trainer would
                 # flatter Spark by ~20 s.
                 "t18_bpe_tokens",
                 # t20 wraps the same unrolled trainer.
                 "t20_fertility"}


def connect(sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(f"SET threads={os.cpu_count()}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def serve(sf_dir, oracle_json):
    """Line protocol for graft.Bench's same-window pairing: the Scala bench
    interleaves its Spark passes with DuckDB passes of the SAME comparable
    query set in the SAME process lifetime/window, so the emitted ratio is
    like-for-like by construction (VERDICT r5 next-#1).

    stdin:  "PASS"  -> run every comparable query once, timed;
                       stdout: one "name<TAB>seconds" line per query
                       (-1 on failure), then "DONE".
            "QUIT"  -> exit.
    The connection (and therefore DuckDB's buffer cache / compiled plans)
    persists across passes — symmetric with Bench's warm SparkSession.
    """
    con = connect(sf_dir)
    oracle = json.load(open(oracle_json))
    names = [n for n in sorted(oracle) if n not in NOT_BASELINES]
    for line in sys.stdin:
        cmd = line.strip()
        if cmd == "QUIT" or cmd == "":
            break
        if cmd != "PASS":
            continue
        for name in names:
            try:
                t0 = time.perf_counter()
                con.sql(oracle[name]).fetchall()
                dt = time.perf_counter() - t0
            except Exception as e:
                print(f"[duck] {name}: FAILED {e}", file=sys.stderr)
                dt = -1.0
            print(f"{name}\t{dt:.6f}", flush=True)
        print("DONE", flush=True)


def main(sf_dir, oracle_json, out="DUCK_times.json"):
    con = connect(sf_dir)
    oracle = json.load(open(oracle_json))
    times = {}
    for name, sql in sorted(oracle.items()):
        if name in NOT_BASELINES:
            continue
        try:
            con.sql(sql).fetchall()  # warmup (buffer cache, plan)
            passes = []
            for _ in range(3):
                t0 = time.perf_counter()
                con.sql(sql).fetchall()
                passes.append(time.perf_counter() - t0)
            times[name] = statistics.median(passes)
            print(f"{name:28s} {times[name]*1000:8.1f} ms", file=sys.stderr)
        except Exception as e:
            print(f"{name}: FAILED {e}", file=sys.stderr)
            times[name] = -1.0
    ok = {k: v for k, v in times.items() if v >= 0}
    line = json.dumps({
        "engine": "duckdb", "threads": os.cpu_count(), "sf": sf_dir,
        "total": round(sum(ok.values()), 4), "n": len(ok),
        "excluded_naive_oracles": sorted(NOT_BASELINES),
        "queries": {k: round(v, 4) for k, v in sorted(times.items())}})
    print(line)
    with open(out, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    if "--serve" in sys.argv:
        serve(sys.argv[1], sys.argv[2])
    else:
        main(sys.argv[1], sys.argv[2], *sys.argv[3:])
