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
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt, round(sum(l_quantity),2) AS s_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin)
    val df = query.Declared.q4(spark, sf).collect().map(_.toString).toSeq
    assert(sql == df)
  }

  test("q14 join via SQL string equals DataFrame API") {
    val sql = viaSql(
      """SELECT c.c_mktsegment AS seg, count(*) AS cnt, round(sum(o.o_totalprice),2) AS rev
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY seg""".stripMargin)
    val df = query.DeclaredExt.q14(spark, sf).collect().map(_.toString).toSeq
    assert(sql == df)
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
  }

  test("count() dialect + OFFSET work through the SQL path") {
    val r = viaSql("SELECT count() AS c FROM orders")
    assert(r.length == 1)
    val page = viaSql("SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 10 OFFSET 10")
    val df = query.Declared.q10Offset(spark, sf).collect().map(_.toString).toSeq
    assert(page == df)
  }
}
