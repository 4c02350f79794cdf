#!/usr/bin/env python3
"""Third-decade DuckDB pairing for ScaleCheck --sf1bench: run the SAME
declared-oracle SQL the driver grades (t10/t12/t15/d7/d12/d16 — the
real-algorithm, non-naive oracles) over the SAME 50k synthetic parquet
the Spark side times, fresh statement per pass, min of 3.

Usage: duck_sf1.py <synth_parquet_dir> <oracle_sql.json>
"""
import json
import os
import sys
import time

import duckdb

QUERIES = ["t10_tfidf_topk", "t12_repetition", "t15_novelty",
           "d7_source_overlap", "d12_substring_dedup", "d16_containment"]


def main():
    synth_dir, oracle_path = sys.argv[1], sys.argv[2]
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(f"SET threads={os.cpu_count()}")
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{synth_dir}/*.parquet')")
    total = 0.0
    for name in QUERIES:
        sql = oracle[name]
        con.execute(sql).fetchall()  # warmup (plan + buffer cache)
        best = min(_timed(con, sql) for _ in range(3))
        total += best
        print(f"DUCK50K {name} {best:.3f} s")
    print(f"DUCK50K total {total:.3f} s ({os.cpu_count()} threads, "
          "fresh statement per pass, min of 3)")


def _timed(con, sql):
    t0 = time.time()
    con.execute(sql).fetchall()
    return time.time() - t0


if __name__ == "__main__":
    main()
