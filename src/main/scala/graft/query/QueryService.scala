package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.functions._

import graft.core.TimeUtils

/** Tables a query can see. Implementations: a static parquet catalog
  * (testdata) or manifest-backed storage with time pruning (Storage). */
trait TableProvider {
  /** Load `name` restricted to rows possibly in [startNs, endNs] — the
    * provider may prune files by the range but must not drop matching rows.
    * None if the table doesn't exist. */
  def load(spark: SparkSession, name: String, startNs: Long, endNs: Long): Option[DataFrame]
}

/** The HTTP-facing query engine: HEPop dialect → real Spark SQL parse →
  * virtual-column views → default-time-range injection → manifest-pruned
  * scan → Catalyst execution → JSON rows.
  *
  * Replaces the reference's five-regex rewriter (query.js:67–141) with an
  * actual parser and implements the DOCUMENTED surface the reference
  * drops: virtual columns (README.md:138–147), GROUP BY (README.md:216),
  * OFFSET (README.md:135) — SURVEY Appendix A items 1–3.
  *
  * Scale note: everything after view registration is a declarative
  * Catalyst plan — pushdown/pruning/codegen apply as on any cluster.
  * The only driver-side work is manifest pruning (O(files) JSON).
  */
final class QueryService(
    spark: SparkSession,
    tables: TableProvider,
    nowNs: () => Long = () => System.currentTimeMillis() * TimeUtils.NsPerMs,
    defaultRangeNs: Long = 600L * 1000000000L) { // last 10 min (query.js:9)

  import QueryService._

  def execute(sql: String): DataFrame = {
    val parser = spark.sessionState.sqlParser
    val plan0 = parser.parsePlan(Dialect.normalize(sql))

    val relNames = plan0.collect {
      case r: UnresolvedRelation => r.multipartIdentifier.mkString(".")
    }.distinct

    // Reference semantics: no time predicate → inject last-10-min range
    // (query.js:9, 109–117). Predicate detection is on the real plan, and
    // the injected filter sits directly above each base relation so it
    // applies BEFORE aggregation and reaches the parquet scan.
    val range = extractTimeRange(plan0)
    val effective = range.getOrElse {
      val now = nowNs()
      TimeRange(now - defaultRangeNs, now)
    }

    val plan1 =
      if (range.isEmpty && relNames.exists(isTimeSeriesTable)) injectTimeFilter(plan0, effective)
      else plan0

    // Register each referenced table as a temp view with virtual columns
    // appended (time/src_ip/dst_ip/src_port/dst_port — README.md:138–147).
    val physicalCols = relNames.flatMap { name =>
      tables.load(spark, name, effective.startNs, effective.endNs).map { df =>
        withVirtualColumns(df).createOrReplaceTempView(viewName(name))
        name -> df.columns.toSeq
      }
    }.toMap

    // `SELECT *` must expose only physical columns (reference `*` passes
    // through to DuckDB over the raw file, README.md:141–143) — expand the
    // star to the physical list before analysis sees the wide view.
    val plan2 = expandStars(plan1, relNames, physicalCols)

    // Point the plan at the registered views.
    val plan3 = plan2.transformUp {
      case r: UnresolvedRelation if physicalCols.contains(r.multipartIdentifier.mkString(".")) =>
        UnresolvedRelation(Seq(viewName(r.multipartIdentifier.mkString("."))))
    }

    org.apache.spark.sql.graftshim.PlanExec.ofRows(spark, plan3)
  }

  /** JSON result sink (reference query.js:173–179 / hepop.js:1043–1052):
    * array of {col: value} objects; Long-safe by construction. */
  def executeJson(sql: String): String =
    execute(sql).toJSON.collect().mkString("[", ",", "]")

  private def isTimeSeriesTable(name: String): Boolean =
    tables.load(spark, name, Long.MinValue, Long.MaxValue)
      .exists(df => df.columns.contains("timestamp"))

  private def injectTimeFilter(plan: LogicalPlan, r: TimeRange): LogicalPlan = {
    // Reference's rewritten filter form: ms-truncated ISO timestamp range
    // (query.js:165–166).
    val cond = spark.sessionState.sqlParser.parseExpression(
      s"timestamp >= TIMESTAMP '${TimeUtils.isoMs(r.startNs)}' AND " +
      s"timestamp <= TIMESTAMP '${TimeUtils.isoMs(r.endNs)}'")
    plan.transformUp { case rel: UnresolvedRelation => Filter(cond, rel) }
  }
}

object QueryService {

  final case class TimeRange(startNs: Long, endNs: Long)

  private[query] def viewName(table: String): String =
    "graft_q_" + table.replaceAll("[^A-Za-z0-9_]", "_")

  /** Virtual columns (README.md:138–147; tier [D] — never implemented in
    * the reference, SURVEY Appendix A#1). Appended only when the physical
    * schema matches: HEP tables get the rcinfo-derived quad + `time`;
    * any other table with a `timestamp`/`ts` column gets `time`. */
  def withVirtualColumns(df: DataFrame): DataFrame = {
    val cols = df.columns.toSet
    val base =
      if (cols.contains("timestamp")) df.withColumn("time", col("timestamp"))
      else if (cols.contains("ts") && !cols.contains("time")) df.withColumn("time", col("ts"))
      else df
    if (cols.contains("rcinfo"))
      base
        .withColumn("src_ip", get_json_object(col("rcinfo"), "$.srcIp"))
        .withColumn("dst_ip", get_json_object(col("rcinfo"), "$.dstIp"))
        .withColumn("src_port", get_json_object(col("rcinfo"), "$.srcPort").cast("int"))
        .withColumn("dst_port", get_json_object(col("rcinfo"), "$.dstPort").cast("int"))
    else base
  }

  /** Extract the query's time bounds for file pruning. Mirrors the
    * reference's rules (query.js:88–117) but keeps ALL time predicates and
    * preserves strictness for row filtering (the plan itself is untouched —
    * this range only gates which files are scanned, so widening by ≥/≤ at
    * file granularity is always safe). */
  def extractTimeRange(plan: LogicalPlan): Option[TimeRange] = {
    var start = Long.MinValue
    var end = Long.MaxValue
    var found = false

    def tsNs(lit: Any): Option[Long] = lit match {
      case s: org.apache.spark.unsafe.types.UTF8String => parseTs(s.toString)
      case s: String => parseTs(s)
      case l: Long => Some(l * 1000L) // TimestampType literal: µs → ns
      case _ => None
    }

    def visit(e: Expression): Unit = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) => visit(l); visit(r)
      case cmp: org.apache.spark.sql.catalyst.expressions.BinaryComparison =>
        (cmp.left, cmp.right) match {
          case (a: UnresolvedAttribute, Literal(v, _)) if isTimeAttr(a) =>
            tsNs(v).foreach(ns => apply(cmp, ns, flipped = false))
          case (Literal(v, _), a: UnresolvedAttribute) if isTimeAttr(a) =>
            tsNs(v).foreach(ns => apply(cmp, ns, flipped = true))
          case (c: org.apache.spark.sql.catalyst.expressions.Cast, Literal(v, _)) =>
            c.child match {
              case a: UnresolvedAttribute if isTimeAttr(a) =>
                tsNs(v).foreach(ns => apply(cmp, ns, flipped = false))
              case _ =>
            }
          case _ =>
        }
      case _ => // OR / NOT subtrees can't narrow the range soundly — skip
    }

    def apply(cmp: org.apache.spark.sql.catalyst.expressions.BinaryComparison,
        ns: Long, flipped: Boolean): Unit = {
      import org.apache.spark.sql.catalyst.expressions._
      found = true
      val op = cmp match {
        case _: GreaterThan | _: GreaterThanOrEqual => if (flipped) "<" else ">"
        case _: LessThan | _: LessThanOrEqual => if (flipped) ">" else "<"
        case _: EqualTo => "="
        case _ => return
      }
      op match {
        case ">" => start = math.max(start, ns)
        case "<" => end = math.min(end, ns)
        case "=" => start = math.max(start, ns); end = math.min(end, ns)
      }
    }

    plan.foreach {
      case f: Filter => visit(f.condition)
      case _ =>
    }
    if (found) Some(TimeRange(start, end)) else None
  }

  private def isTimeAttr(a: UnresolvedAttribute): Boolean = {
    val n = a.nameParts.last.toLowerCase
    n == "time" || n == "timestamp" || n == "ts"
  }

  private def parseTs(s: String): Option[Long] =
    try {
      val t = java.sql.Timestamp.valueOf(
        if (s.contains(" ") || s.contains("T")) s.replace("T", " ")
        else s + " 00:00:00")
      Some(t.getTime * TimeUtils.NsPerMs)
    } catch { case _: Exception => None }

  /** Expand `SELECT *` over a known single table to its physical columns. */
  def expandStars(plan: LogicalPlan, relNames: Seq[String],
      physicalCols: Map[String, Seq[String]]): LogicalPlan =
    if (relNames.length != 1 || !physicalCols.contains(relNames.head)) plan
    else {
      val phys = physicalCols(relNames.head)
      plan.transformUp {
        case p: Project if p.projectList.exists(_.isInstanceOf[UnresolvedStar]) =>
          val expanded = p.projectList.flatMap {
            case _: UnresolvedStar => phys.map(c => UnresolvedAttribute(Seq(c)))
            case other => Seq(other)
          }
          Project(expanded, p.child)
      }
    }
}
