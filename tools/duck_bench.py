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
                 "d9_embedding_dedup", "d10_jaccard_join", "h5_llm_sql_dedup"}


def main(sf_dir, oracle_json, out="DUCK_times.json"):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(f"SET threads={os.cpu_count()}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
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
    main(sys.argv[1], sys.argv[2], *sys.argv[3:])
