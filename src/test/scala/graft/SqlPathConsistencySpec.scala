package graft

import graft.core.StaticCatalog
import graft.query.QueryService

/** The SQL entry path (QueryService: parse → dialect → views → Catalyst)
  * must agree with the DataFrame-API formulations of the same declared
  * queries — the two front doors of the engine cannot diverge. */
class SqlPathConsistencySpec extends GraftSuite {

  private lazy val qs = new QueryService(spark, new StaticCatalog(sf))

  private def viaSql(sql: String) = qs.execute(sql).collect().map(_.toString).toSeq

  test("q1 via SQL string equals DataFrame API") {
    val sql = viaSql(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 100000 AND o_orderstatus = 'O'
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin)
    val df = query.Declared.q1(spark, sf).collect().map(_.toString).toSeq
    assert(sql == df)
  }

  test("q4 group-by via SQL string equals DataFrame API") {
    val sql = viaSql(
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |sum(cast(cast(l_quantity AS decimal(18,6)) * 1000000 AS bigint)) AS s_qty_micros
        |FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin)
    val df = query.Declared.q4(spark, sf).collect().map(_.toString).toSeq
    assert(sql == df)
  }

  test("q14 join via SQL string equals DataFrame API") {
    val sql = viaSql(
      """SELECT c.c_mktsegment AS seg, count(*) AS cnt,
        |sum(cast(cast(o.o_totalprice AS decimal(18,6)) * 1000000 AS bigint)) AS rev_micros
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY seg""".stripMargin)
    val df = query.DeclaredExt.q14(spark, sf).collect().map(_.toString).toSeq
    assert(sql == df)
  }

  test("LLM operator views: SQL path equals the Scala API (dedup)") {
    query.LlmViews.register(spark, sf)
    val sql = viaSql("SELECT doc_id, copies FROM llm_exact_dedup ORDER BY doc_id")
    val api = graft.ops.Dedup.exact(graft.core.Tables.load(spark, sf, "documents"))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(sql == api)
    assert(sql.nonEmpty)
  }

  test("LLM operator views: SQL path equals the Scala API (near-dup pairs + cosine)") {
    query.LlmViews.register(spark, sf)
    val sqlPairs = viaSql("SELECT doc_a, doc_b, j_x10k FROM llm_near_dup_pairs ORDER BY doc_a, doc_b")
    val apiPairs = graft.ops.Dedup.minhashLsh(graft.core.Tables.load(spark, sf, "documents"))
      .collect().map(_.toString).toSeq
    assert(sqlPairs == apiPairs)
    val sqlCos = viaSql(
      "SELECT query_id, neighbor_id, cos_x10k FROM llm_cosine_topk WHERE query_id = 1 ORDER BY cos_x10k DESC, neighbor_id")
    val apiCos = graft.ops.Similarity
      .cosineTopK(graft.core.Tables.load(spark, sf, "embeddings"),
        org.apache.spark.sql.functions.col("vec_id") < 5)
      .where(org.apache.spark.sql.functions.col("query_id") === 1)
      .collect().map(_.toString).toSeq
    assert(sqlCos == apiCos)
    assert(sqlCos.nonEmpty)
  }

  test("LLM operator views: SQL path equals the Scala API (round-7 ops)") {
    query.LlmViews.register(spark, sf)
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val sqlSpans = viaSql(
      "SELECT doc_a, doc_b, a_start, b_start, span_words FROM llm_substring_dedup ORDER BY doc_a, doc_b, a_start, b_start")
    val apiSpans = graft.ops.Dedup.substringDedup(docs)
      .collect().map(_.toString).toSeq
    assert(sqlSpans == apiSpans && sqlSpans.nonEmpty)
    val sqlNov = viaSql(
      "SELECT doc_id, n_windows, n_dup, dup_permille FROM llm_novelty WHERE dup_permille > 0 ORDER BY doc_id")
    val apiNov = graft.ops.Dedup.noveltyScore(docs)
      .where(org.apache.spark.sql.functions.col("dup_permille") > 0)
      .collect().map(_.toString).toSeq
    assert(sqlNov == apiNov && sqlNov.nonEmpty)
    val sqlPmi = viaSql(
      "SELECT doc_id, n_bigrams, pmi_score FROM llm_pmi_quality ORDER BY doc_id LIMIT 20")
    val apiPmi = graft.ops.TextAnalysis.pmiQuality(docs)
      .limit(20).collect().map(_.toString).toSeq
    assert(sqlPmi == apiPmi && sqlPmi.nonEmpty)
  }

  test("SELECT * stays physical across joins, aliases, and qualified stars") {
    // events is time-series: the view carries a virtual `time` column that
    // must NOT leak into any star expansion (reference README.md:141-143).
    val eventsCols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val customerCols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

    // Join star: both tables' physical columns in FROM order (DuckDB's
    // SELECT * column order over a join).
    val j = qs.execute(
      """SELECT * FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |WHERE e.ts >= TIMESTAMP '2000-01-01 00:00:00'
        |ORDER BY e.event_id LIMIT 3""".stripMargin)
    assert(j.columns.toSeq == eventsCols ++ customerCols)

    // Qualified star over an alias: that table only.
    val q = qs.execute(
      """SELECT e.* FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |WHERE e.ts >= TIMESTAMP '2000-01-01 00:00:00'
        |ORDER BY e.event_id LIMIT 3""".stripMargin)
    assert(q.columns.toSeq == eventsCols)

    // Qualified star by table name, no alias.
    val t = qs.execute(
      """SELECT events.* FROM events JOIN customer ON events.user_id = customer.c_custkey
        |WHERE events.ts >= TIMESTAMP '2000-01-01 00:00:00'
        |ORDER BY events.event_id LIMIT 3""".stripMargin)
    assert(t.columns.toSeq == eventsCols)

    // Mixed list: qualified star + extra column.
    val m = qs.execute(
      """SELECT c.*, e.event_type FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |WHERE e.ts >= TIMESTAMP '2000-01-01 00:00:00'
        |ORDER BY e.event_id LIMIT 3""".stripMargin)
    assert(m.columns.toSeq == customerCols :+ "event_type")

    // UNION ALL branches expand independently (scope = own branch).
    val u = qs.execute(
      """SELECT * FROM events WHERE ts >= TIMESTAMP '2000-01-01 00:00:00'
        |UNION ALL SELECT * FROM events WHERE ts >= TIMESTAMP '2999-01-01 00:00:00'""".stripMargin)
    assert(u.columns.toSeq == eventsCols)

    // Mixed base + derived join: base side expands to physical columns,
    // derived side keeps ALL its columns (regression: the derived side's
    // columns were silently dropped when the base side expanded alone).
    val bd = qs.execute(
      """SELECT * FROM events e JOIN (SELECT c_custkey AS k, c_name FROM customer) x
        |ON e.user_id = x.k
        |WHERE e.ts >= TIMESTAMP '2000-01-01 00:00:00'
        |ORDER BY e.event_id LIMIT 3""".stripMargin)
    assert(bd.columns.toSeq == eventsCols ++ Seq("k", "c_name"))

    // Derived-table star still resolves (inner output is physical-only).
    val d = qs.execute(
      """SELECT * FROM (SELECT event_id, event_type FROM events
        |WHERE ts >= TIMESTAMP '2000-01-01 00:00:00') x ORDER BY event_id LIMIT 3""".stripMargin)
    assert(d.columns.toSeq == Seq("event_id", "event_type"))
  }

  test("CTEs and subqueries resolve through the SQL path") {
    val cte = viaSql(
      """WITH big AS (SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 200000)
        |SELECT o_custkey, count(*) AS n FROM big GROUP BY o_custkey
        |ORDER BY n DESC, o_custkey LIMIT 10""".stripMargin)
    assert(cte.nonEmpty)
    val sub = viaSql(
      """SELECT avg_p FROM (
        |  SELECT o_orderstatus, round(avg(o_totalprice), 2) AS avg_p
        |  FROM orders GROUP BY o_orderstatus) t
        |ORDER BY avg_p""".stripMargin)
    assert(sub.length == 3)
    // Scalar subquery in WHERE.
    val scalar = viaSql(
      "SELECT count(*) AS c FROM orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)")
    assert(scalar.length == 1)
  }

  test("native expressions are callable as SQL functions") {
    graft.functions.GraftExtensions.registerAll(spark)
    val j = viaSql(
      """SELECT doc_id, round(jaccard_sim(word_shingles(text), word_shingles(text)), 4) AS self_j
        |FROM documents ORDER BY doc_id LIMIT 5""".stripMargin)
    assert(j.length == 5 && j.forall(_.contains("1.0")), j)
    val sh = viaSql(
      "SELECT simhash60(md5_word_hashes(text)) AS f FROM documents ORDER BY doc_id LIMIT 3")
    assert(sh.length == 3)
    val cos = viaSql(
      "SELECT round(cosine_sim(embedding, embedding), 4) AS c FROM embeddings ORDER BY vec_id LIMIT 3")
    assert(cos.forall(_.contains("1.0")), cos)
    val l2 = viaSql(
      "SELECT round(l2sq(embedding, embedding), 4) AS z FROM embeddings ORDER BY vec_id LIMIT 3")
    assert(l2.forall(_.contains("0.0")), l2)
    val iss = viaSql(
      """SELECT sorted_intersect_size(sort_array(word_shingles(text)),
        |sort_array(word_shingles(text))) = size(word_shingles(text)) AS ok
        |FROM documents ORDER BY doc_id LIMIT 5""".stripMargin)
    assert(iss.length == 5 && iss.forall(_.contains("true")), iss)
  }

  test("llm_pq_topk: SQL equals Scala API; coded scan prunes to vec_id+embedding") {
    query.LlmViews.register(spark, sf)
    val sql = viaSql(
      """SELECT query_id, neighbor_id, pqdot_x10k FROM llm_pq_topk
        |WHERE query_id = 1 ORDER BY pqdot_x10k DESC, neighbor_id""".stripMargin)
    val emb = graft.core.Tables.load(spark, sf, "embeddings")
    val api = graft.ops.Similarity
      .pqTopK(emb, org.apache.spark.sql.functions.col("vec_id") < 5,
        graft.ops.Similarity.labelPqCodebooks(emb))
      .where(org.apache.spark.sql.functions.col("query_id") === 1)
      .collect().map(_.toString).toSeq
    assert(sql == api)
    assert(sql.nonEmpty)
    // The view stores a plan whose codebook is inlined literals: the
    // embeddings scan under it must read only (vec_id, embedding) —
    // `label` fed the REGISTRATION-time codebook build, not the query.
    val plan = spark.table("llm_pq_topk").queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("label"), "label column must not reach the coded scan")
  }

  test("llm_knn_graph: SQL equals Scala API under a pushed predicate") {
    query.LlmViews.register(spark, sf)
    val sql = viaSql(
      """SELECT query_id, neighbor_id, cos_x10k FROM llm_knn_graph
        |WHERE query_id = 7 ORDER BY cos_x10k DESC, neighbor_id""".stripMargin)
    val api = graft.ops.Similarity
      .knnGraph(graft.core.Tables.load(spark, sf, "embeddings"))
      .where(org.apache.spark.sql.functions.col("query_id") === 7)
      .collect().map(_.toString).toSeq
    assert(sql == api)
    assert(sql.nonEmpty)
  }

  test("llm_cluster_split reads the label artifact, never re-clusters") {
    // VERDICT r6 #5 done-criterion: a (repeated) view query must carry
    // NO clustering subtree — labels come from the build-once
    // materialized parquet, so the plan is scan + join + aggregate.
    query.LlmViews.register(spark, sf)
    val df = spark.sql("SELECT * FROM llm_cluster_split")
    val plan = df.queryExecution.executedPlan.toString
    for (marker <- Seq("MinHash", "minhash", "word_shingles", "WordShingles"))
      assert(!plan.contains(marker),
        s"clustering subtree ($marker) leaked into the served plan")
    assert(plan.contains("graft-artifacts"),
      "labels must scan the materialized artifact")
    // And the artifact path answers exactly what inline clustering does.
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val inline = graft.ops.Sampling.clusterSafeSplit(docs).collect().map(_.toString)
    assert(df.collect().map(_.toString).toSeq == inline.toSeq)
  }

  test("every llm_* view resolves and answers through the SQL path") {
    query.LlmViews.register(spark, sf)
    query.LlmViews.views(spark, sf).foreach { case (name, df) =>
      val viaView = viaSql(s"SELECT count() AS c FROM $name")
      assert(viaView.length == 1, s"$name: $viaView")
      // The view stores the PLAN: its count equals the Scala API's.
      val n = df.count()
      assert(viaView.head.contains(s"[$n]"), s"$name via SQL $viaView vs API $n")
    }
  }

  test("count() dialect + OFFSET work through the SQL path") {
    val r = viaSql("SELECT count() AS c FROM orders")
    assert(r.length == 1)
    val page = viaSql("SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 10 OFFSET 10")
    val df = query.Declared.q10Offset(spark, sf).collect().map(_.toString).toSeq
    assert(page == df)
  }
}
