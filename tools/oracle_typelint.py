#!/usr/bin/env python3
"""Oracle result-TYPE lint — no Spark needed.

The driver's comparator is pandas-based: DuckDB HUGEINT (result of
`sum(INTEGER)`, window sums) and DECIMAL render as float64 in `.df()`,
so an oracle whose result carries one hashes `0.0` against Spark's `0`
— rows and schema green, hash red, irreproducible under fetchall().
That failure mode cost rounds 2–4 on t5_profile/q20_sessionize.

This lint binds every declared oracle against the real tables and fails
if any output column has a banned DuckDB type. Run it after editing any
oracle, before a full Verify:

    sbt 'runMain graft.Verify --sql-only /tmp/oracles'
    python3 tools/oracle_typelint.py /root/testdata/sf0.001 /tmp/oracles/oracle_sql.json

Binding (`.types` on a relation) does not execute the query, so even the
deliberately-slow d5/d6 recursive oracles lint instantly.
"""
import json, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

BANNED = ("HUGEINT", "UHUGEINT", "DOUBLE", "FLOAT", "DECIMAL")

# DOUBLE columns that are VALUE-PRESERVING: verbatim projections of a
# stored parquet double, max() (a selection, not arithmetic), or
# nullif/coalesce against exactly-representable literals. Both sides see
# the identical bit pattern, so pandas float64 + %.17g hashes agree —
# green since round 1. Any DOUBLE born from arithmetic (sum/avg/divide/
# round) is still banned: add nothing here without that proof.
ALLOWED = {
    ("h3_lp_filter", "usage_idle"),        # raw LP field
    ("q13_conditional", "disc"),           # nullif/coalesce pass-through
    ("q15_window_topk", "o_totalprice"),   # raw column
    ("q1_filter_order_limit", "o_totalprice"),  # raw column
    ("q29_asof_join", "view_value"),       # max() = selection of stored value
}


def main(sf_dir, oracle_json):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_json))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
            offenders = [
                f"{c}:{str(ty).upper()}"
                for c, ty in zip(rel.columns, rel.types)
                if any(str(ty).upper().startswith(b) for b in BANNED)
                and (name, c.lower()) not in ALLOWED]
        except Exception as e:
            print(f"FAIL {name}: oracle does not bind: {e}")
            failures += 1
            continue
        if offenders:
            print(f"FAIL {name}: banned oracle result type(s): "
                  f"{', '.join(offenders)} — CAST to BIGINT/scaled integer")
            failures += 1
        else:
            print(f"OK   {name}")
    print(f"{len(oracle) - failures}/{len(oracle)} oracles type-clean")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
