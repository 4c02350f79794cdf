#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 gate: run SparkEntry's dumped
results (Verify output parquet) against the DuckDB oracle SQL on the same
scale-factor tables, compare row counts, column names, and value hashes.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [name,name,...]

The optional third argument restricts the check to the named queries —
for spot-checking new operators at sf0.1, where a handful of oracles
(the recursive-closure d5/d6 ground truths) are far too slow to rerun.

DRIVER FAITHFULNESS (round-4 lesson): the driver's comparator is
pandas-based. DuckDB's `.fetchall()` returns Python ints, where HUGEINT
(the result type of `sum(INTEGER)` and window sums) survives exactly —
but `.df()` renders HUGEINT as float64, so the driver hashes `0.0`
against Spark's `0`. Three rounds of t5/q20 hash-fails were exactly this
blind spot. Therefore BOTH sides are now read via `.df()` and hashed
from pandas-converted values, and a hard TYPE LINT fails any query whose
DuckDB (or Spark-parquet) result carries a HUGEINT / DOUBLE / FLOAT /
DECIMAL column: every hashed output must arrive as int64 / bool /
string / timestamp.
"""
import json, sys, math
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# DuckDB result types that pandas coerces lossily (HUGEINT -> float64,
# DECIMAL -> float64/object depending on version) or that are inherently
# representation-fragile across comparator environments (DOUBLE/FLOAT).
BANNED_TYPES = ("HUGEINT", "UHUGEINT", "DOUBLE", "FLOAT", "DECIMAL")

# VALUE-PRESERVING doubles (verbatim stored-column projections, max(),
# nullif/coalesce with exact literals — never arithmetic): identical bit
# patterns on both sides, so float64 + %.17g hashing is exact. Keep in
# sync with tools/oracle_typelint.py; add nothing born from arithmetic.
ALLOWED_DOUBLES = {
    ("h3_lp_filter", "usage_idle"),
    ("q13_conditional", "disc"),
    ("q15_window_topk", "o_totalprice"),
    ("q1_filter_order_limit", "o_totalprice"),
    ("q29_asof_join", "view_value"),
}


def lint_types(name, side, cols, types):
    """Return list of 'col:TYPE' offenders for banned result types."""
    bad = []
    for c, t in zip(cols, types):
        ts = str(t).upper()
        if any(ts.startswith(b) for b in BANNED_TYPES) \
                and (name, c.lower()) not in ALLOWED_DOUBLES:
            bad.append(f"{c}:{ts}")
    return [f"{side} {b}" for b in bad]


def canon(v):
    """Canonicalize a pandas-converted cell the way a pandas comparator
    sees it. NaN and NULL are indistinguishable after .df() (both NaN in
    a float column), so both map to NULL here — faithful to the driver."""
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        return f"{f:.17g}"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v)).lower()
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return "NULL" if pd.isna(v) else v.isoformat()
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def df_rows(df):
    return list(df.itertuples(index=False, name=None))


def array_cols(rows):
    """Indices of columns holding list/array values — the driver's
    pandas-based comparator cannot hash these (round-2 e3 lesson).
    Scans many rows, not just the first: a leading NULL in an array
    column must not hide it."""
    bad = set()
    for r in rows[:50]:
        bad |= {i for i, v in enumerate(r)
                if isinstance(v, (list, tuple, np.ndarray))}
    return sorted(bad)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = ["\x01".join(canon(r[i]) for i in order) for r in rows]
    import hashlib
    h = hashlib.sha256()
    for ln in lines:  # row order preserved (queries have stable ORDER BY)
        h.update(ln.encode()); h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = [c.lower() for c in spark_rel.columns]
            s_types = spark_rel.types
            s_rows = df_rows(spark_rel.df())
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}"); failures += 1; continue
        try:
            d_rel = con.sql(sql)
            d_cols = [c.lower() for c in d_rel.columns]
            d_types = d_rel.types
            d_rows = df_rows(d_rel.df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); failures += 1; continue
        lint = (lint_types(name, "oracle", d_cols, d_types) +
                lint_types(name, "spark", s_cols, s_types))
        if lint:
            print(f"FAIL {name}: banned result type(s): {', '.join(lint)} — "
                  "pandas coerces these lossily (HUGEINT->float64); "
                  "CAST to BIGINT / scaled integer in both the query and the oracle")
            failures += 1
            continue
        bad = sorted({s_cols[i] for i in array_cols(s_rows)} |
                     {d_cols[i] for i in array_cols(d_rows)})
        if bad:
            print(f"FAIL {name}: array-typed result column(s) {bad} — "
                  "driver comparator cannot hash arrays; declare exploded scalar rows")
            failures += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}"); failures += 1; continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}"); failures += 1; continue
        hs, hd = table_hash(s_rows, s_cols), table_hash(d_rows, d_cols)
        if hs != hd:
            print(f"FAIL {name}: hash mismatch ({len(s_rows)} rows)")
            order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            shown = 0
            for i, (a, b) in enumerate(zip(s_rows, d_rows)):
                ca = "\x01".join(canon(a[j]) for j in order)
                cb = "\x01".join(canon(b[j]) for j in order)
                if ca != cb:
                    print(f"  row {i}: spark={a} duck={b}")
                    shown += 1
                    if shown >= 3: break
            failures += 1
        else:
            print(f"OK   {name}: {len(s_rows)} rows")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None)
