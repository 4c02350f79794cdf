package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Final-result ordering for SMALL outputs (declared queries end in a
  * deterministic ORDER BY over at most a few thousand rows).
  *
  * `df.orderBy(...)` plans a global sort via RangePartitioning, which
  * (a) runs a separate range-boundary SAMPLING job that RE-EXECUTES the
  * final stage's pipeline — for a map-only CPU-heavy query that is
  * nearly 2× the compute — and (b) adds a range exchange plus an
  * N-partition collect. For a result that is already small, a
  * round-robin exchange to ONE partition followed by an in-partition
  * sort produces the identical global order with one job, one exchange,
  * and a single-task collect/write.
  *
  * Upstream parallelism is untouched: `repartition(1)` is an exchange,
  * so everything before it still runs wide; only the final sort of the
  * (small) result is single-task. Do NOT use this on large outputs —
  * it is the moral equivalent of the reference's single-writer result
  * sink (query.js:173–179), correct exactly because query results are
  * bounded.
  *
  * LAYERING: for per-document operators (langid, quality, simhash, …)
  * whose output is corpus-sized, the final sort is PRESENTATION of the
  * bounded declared-query corpus, not part of the operator — those
  * functions take `ordered: Boolean` and the composition layer
  * (LlmViews, anything a server exposes over an arbitrarily large dir)
  * registers the UNSORTED plan, so no corpus ever funnels through the
  * single-task sort outside a declared result dump.
  */
object Out {
  implicit final class SmallOrderOps(private val df: DataFrame) extends AnyVal {
    def orderSmall(c0: String, cs: String*): DataFrame =
      df.repartition(1).sortWithinPartitions(c0, cs: _*)
    def orderSmall(cols: Column*): DataFrame =
      df.repartition(1).sortWithinPartitions(cols: _*)

    /** orderSmall for a result whose plan already ends in a SHUFFLE
      * (aggregate/repartition/non-broadcast join): `coalesce(1)` merges
      * the post-shuffle partitions into one task with NO new exchange —
      * one stage fewer than repartition(1) — while the map side keeps
      * its full width. NEVER use on a map-only pipeline: coalesce
      * propagates down to the last wide dependency, and with none it
      * would serialize the scan itself. */
    def orderAgg(c0: String, cs: String*): DataFrame =
      df.coalesce(1).sortWithinPartitions(c0, cs: _*)
    def orderAgg(cols: Column*): DataFrame =
      df.coalesce(1).sortWithinPartitions(cols: _*)
  }
}
